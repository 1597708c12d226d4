package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** BPE merge-candidate statistics — the first iteration of byte-pair-
  * encoding tokenizer training (Sennrich et al. 2016) at corpus scale:
  * count adjacent character pairs across the corpus and surface the
  * top merge candidates. (Beyond the reference's own surface; the
  * tokenizer-training companion to [[Analysis.bpeIshTokenCount]] in the
  * LLM-data-pipeline addendum.)
  *
  * 100 TB shape — the classic BPE scale trick, re-expressed Spark-first:
  * pair counting never touches the corpus directly. The corpus collapses
  * FIRST to the (word, frequency) vocabulary table (one map-side-partial
  * aggregate — by Heaps' law the vocab is orders of magnitude smaller
  * than the corpus), and pair extraction explodes the VOCAB, weighting
  * each in-word pair by the word's corpus frequency. Every subsequent
  * BPE iteration would rerun over the same vocab-sized table, which is
  * why real trainers iterate in minutes over terabyte corpora. The
  * top-k lands via orderBy+limit = `TakeOrderedAndProject` (per-partition
  * heaps, no global sort materialization).
  *
  * Pair multiplicity within a word is preserved ("aaa" contributes
  * "a a" twice per occurrence), matching the published algorithm.
  * Tie-break: (count DESC, pair ASC) — a total order, so the top-k set
  * is deterministic on both engines.
  */
object Bpe {

  /** Merge candidates reported. */
  val TopK = 20

  /** (pair, cnt) — the TopK most frequent adjacent character pairs,
    * corpus-frequency-weighted.
    */
  def topPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.ops.ScaleOps.widen(Tables.documents(spark, dir))
    val vocab = docs
      .select(explode(TextOps.tokenize(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wcnt"))
    val ch = split(col("w"), "")
    val m = greatest(size(ch) - 1, lit(0))
    val pairs = zip_with(slice(ch, lit(1), m), slice(ch, lit(2), m),
      (a, b) => concat(a, lit(" "), b))
    vocab
      .select(explode(pairs).as("pair"), col("wcnt"))
      .groupBy(col("pair")).agg(sum(col("wcnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(TopK)
  }

  /** DuckDB twin: same vocab-first aggregation, same weighting, same
    * total-order top-k.
    */
  def topPairsOracle: String = {
    val tk = TextOps.tokenizeSql("text")
    s"""WITH words AS (
       |  SELECT unnest($tk) AS w FROM documents
       |), vocab AS (
       |  SELECT w, count(*) AS wcnt FROM words GROUP BY w
       |), pairs AS (
       |  SELECT unnest(list_transform(
       |      range(1, greatest(len(string_split(w, '')), 1)),
       |      i -> string_split(w, '')[i] || ' ' || string_split(w, '')[i+1]))
       |    AS pair, wcnt
       |  FROM vocab
       |)
       |SELECT pair, CAST(sum(wcnt) AS BIGINT) AS cnt
       |FROM pairs GROUP BY pair
       |ORDER BY cnt DESC, pair LIMIT $TopK""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_pairs" -> ((s, dir) => topPairs(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "q_bpe_pairs" -> topPairsOracle
  )
}
