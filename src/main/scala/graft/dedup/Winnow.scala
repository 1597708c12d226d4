package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.plans.WinnowHashes

/** Winnowing document fingerprints and the shared-fingerprint pair join —
  * the substring-match detection layer of the dedup family: [[Dedup.Exact]]
  * sees whole-document copies, MinHash/SimHash see whole-document
  * near-dups, [[Dedup.Cdc]] sees shared chunks at content-defined
  * boundaries, and winnowing guarantees detection of ANY shared run of
  * ≥ k+w−1 characters while sampling only ~2/(w+1) of positions — the
  * granularity plagiarism and license-text detection need.
  *
  * Scale shape:
  *   - fingerprinting is per-row codegen'd ([[WinnowHashes]]), linear in
  *     the scan, no shuffle;
  *   - the pair join first drops fingerprints present in more than
  *     [[MaxDocsPerFp]] documents (ubiquitous boilerplate hashes — the
  *     exact analogue of a stopword list, and the bound that keeps
  *     per-fingerprint groups, hence candidate pairs, O(MaxDocsPerFp²)
  *     instead of corpus²);
  *   - surviving (fp → doc list) groups pair-join within the group and
  *     aggregate per pair — work ∝ Σ group², bounded by the cap.
  */
object Winnow {

  /** Drop fingerprints appearing in more than this many docs (ubiquity
    * cap — bounds pair-join group size).
    */
  val MaxDocsPerFp = 8

  /** Report doc pairs sharing at least this many surviving fingerprints. */
  val MinShared = 4

  def winnowCol(c: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      WinnowHashes(org.apache.spark.sql.GraftColumnShim.expression(c),
        WinnowHashes.DefaultK, WinnowHashes.DefaultW))

  /** (doc_id, fp) — each document's distinct winnowed fingerprints. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.widen(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(winnowCol(col("text"))).as("fp"))

  /** Doc pairs sharing ≥ [[MinShared]] rare fingerprints, with the count —
    * the match-candidate report a plagiarism pipeline hands to alignment.
    */
  def sharedPairs(spark: SparkSession, dir: String): DataFrame = {
    val fps = fingerprints(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") <= MaxDocsPerFp)
      .select(col("fp"))
    val kept = fps.join(rare, "fp")
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= MinShared)
  }

  private def fpsCte: String = {
    val kh = WinnowHashes.sql("text")
    s"""WITH kh AS (
       |  SELECT doc_id, $kh AS kh FROM documents
       |), p AS (
       |  SELECT doc_id, kh, least(${WinnowHashes.DefaultW}, len(kh)) AS ww
       |  FROM kh WHERE len(kh) > 0
       |), fps AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(kh) - ww + 2), s ->
       |    kh[s - 1 + list_max(list_transform(range(1, ww + 1), j ->
       |      CASE WHEN kh[s + j - 1] = list_min(kh[s : s + ww - 1]) THEN j ELSE 0 END))]
       |  ))) AS fp
       |  FROM p
       |)""".stripMargin
  }

  def fingerprintsOracle: String =
    s"""$fpsCte
       |SELECT doc_id, fp FROM fps""".stripMargin

  def sharedPairsOracle: String =
    s"""$fpsCte, rare AS (
       |  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= $MaxDocsPerFp
       |), kept AS (
       |  SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp)
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $MinShared""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_winnow" -> ((s, dir) => fingerprints(s, dir)),
    "q_winnow_pairs" -> ((s, dir) => sharedPairs(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "q_winnow" -> fingerprintsOracle,
    "q_winnow_pairs" -> sharedPairsOracle
  )
}
