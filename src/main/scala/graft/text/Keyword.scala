package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.Tables

/** E14 — the ES keyword normalizer (`lowercase` + `asciifolding`,
  * `sql_to_es_etl.py:102,111-120`) re-expressed as a native expression so
  * sink-side comparisons behave like the reference's index would.
  *
  * The ES `asciifolding` filter folds the full Unicode Latin repertoire;
  * this normalizer folds the explicit table below via `translate` — a
  * deterministic published spec (like the lemmatizer, SURVEY §7 "UD2
  * fidelity"), applied AFTER `lower` so only lowercase forms are needed.
  * `translate` is a per-row codegen'd expression: no UDF, no shuffle.
  */
object Keyword {

  val FoldFrom = "àáâãäåæçèéêëìíîïðñòóôõöøùúûüýÿšžœß"
  val FoldTo   = "aaaaaaeceeeeiiiidnoooooouuuuyyszes"

  require(FoldFrom.length == FoldTo.length, "fold tables must align 1:1")

  /** Single-char folds only (`translate` is 1:1; æ→e is the lossy rendering
    * ES expands to "ae" — documented divergence, tested as such).
    */
  def keywordNormalize(c: Column): Column = translate(lower(c), FoldFrom, FoldTo)

  def keywordNormalizeSql(c: String): String =
    s"translate(lower($c), '$FoldFrom', '$FoldTo')"

  /** The sink path the reference applies the normalizer to: keyword-typed
    * identity columns of the index document (`sql_to_es_etl.py:102-103`).
    */
  def keywordColumns(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        keywordNormalize(col("c_name")).as("name_kw"),
        keywordNormalize(col("c_mktsegment")).as("segment_kw"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_keyword_normalize" -> ((s, dir) => keywordColumns(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "q_keyword_normalize" ->
      s"""SELECT c_custkey,
         |  ${keywordNormalizeSql("c_name")} AS name_kw,
         |  ${keywordNormalizeSql("c_mktsegment")} AS segment_kw
         |FROM customer""".stripMargin
  )
}
