package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Benchmark decontamination — the training-data hygiene step every LLM
  * pipeline runs before the corpus ships: flag training documents that
  * share a word n-gram with the evaluation/benchmark set, so eval answers
  * don't leak into training. (Beyond the reference's own surface; part of
  * the LLM-data-pipeline addendum alongside the dedup family the
  * reference's NLP preprocess gestures at,
  * `preprocess_and_store_parquets.py:12`.)
  *
  * 100 TB shape: the two sides are wildly asymmetric — eval sets are
  * megabytes (≤ ~10⁶ distinct n-grams ≈ 8 MB of hashed longs) while the
  * corpus is the 100 TB side. So the benchmark's distinct n-gram hashes
  * are BROADCAST (bounded by eval-set size, never corpus size — unlike a
  * vocabulary table, this side cannot grow with the corpus), the corpus
  * side explodes its n-grams map-side into the broadcast hash join, and
  * per-doc hit counts partial-aggregate before the only shuffle (one row
  * per doc). The corpus is scanned once; no corpus-sized state anywhere.
  *
  * N-grams are hashed through the same fused codegen'd
  * [[graft.plans.ShingleHashes]] / md5-fold contract as the MinHash
  * family, so the DuckDB oracle replicates the exact candidate set.
  */
object Contamination {

  /** n-gram window. Real pipelines use 8-13-grams; the fixture documents
    * are ~16 tokens, so 5 keeps planted near-dups detectable while
    * background collisions stay rare.
    */
  val N = 5

  /** Stand-in eval-set membership rule: every 20th doc_id plays the
    * benchmark. A real deployment swaps this for its eval table — the
    * plan shape (small side broadcast, corpus side streamed) is the same.
    */
  val BenchMod = 20L

  /** (doc_id, n_hits, contaminated) for every NON-benchmark document:
    * n_hits = |distinct n-grams shared with the benchmark set|.
    */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.ops.ScaleOps.widen(Tables.documents(spark, dir))
    val grams = Dedup.MinHashLSH.shingleHashes(col("text"), N)
    val bench = docs.filter(col("doc_id") % BenchMod === 0)
      .select(explode(grams).as("g")).distinct()
    // explode_outer keeps zero-gram (short/null-text) docs in the output;
    // count(hit) counts non-null matches, so they score 0 — mirrored by
    // the oracle's LEFT JOIN back to the document list
    val train = docs.filter(col("doc_id") % BenchMod =!= 0)
      .select(col("doc_id"), explode_outer(grams).as("g"))
    train.join(broadcast(bench.withColumn("hit", lit(1))), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("hit")).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  def oracle: String = {
    val hv = Dedup.MinHashLSH.baseHashesSql(Dedup.shinglesNSql("text", N))
    s"""WITH bench AS (
       |  SELECT DISTINCT unnest($hv) AS g FROM documents WHERE doc_id % $BenchMod = 0
       |), grams AS (
       |  SELECT doc_id, unnest($hv) AS g FROM documents WHERE doc_id % $BenchMod <> 0
       |), hits AS (
       |  SELECT gr.doc_id, count(*) AS n_hits
       |  FROM grams gr JOIN bench b USING (g) GROUP BY gr.doc_id
       |)
       |SELECT d.doc_id, coalesce(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
       |  coalesce(h.n_hits, CAST(0 AS BIGINT)) > 0 AS contaminated
       |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
       |WHERE d.doc_id % $BenchMod <> 0""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_decontaminate" -> ((s, dir) => contamination(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "q_decontaminate" -> oracle
  )
}
