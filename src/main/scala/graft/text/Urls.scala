package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** URL extraction and the outlink/domain layer of a web-corpus pipeline:
  * pull URLs out of document text, split host and registrable domain,
  * and aggregate the per-domain link graph — the inputs to domain
  * blocklists, per-domain crawl caps ([[graft.ops.CorpusOps]] X40 caps
  * by SOURCE; this is the same policy keyed by linked-TO domain) and
  * simple link-popularity priors.
  *
  * All per-row regex work (extract, host/domain split) is codegen'd and
  * shuffle-free; the only exchanges are the aggregate by domain. Regex
  * discipline per [[Redact]]/[[Html]]: Java ∩ RE2-safe syntax, stated
  * once and reused verbatim in the DuckDB twin.
  *
  * The fixture corpus carries no URLs, so the gate PLANTS them
  * deterministically from doc_id (the [[Html.plantHtml]] pattern):
  * every doc gains a bare https URL; every 2nd an http `www.` form in
  * an anchor tag (quoted context must not leak into the URL); every
  * 3rd a trailing-path variant. Extraction, splitting, and the
  * in-degree aggregate are then exactly checkable.
  */
object Urls {

  /** One URL: scheme://host(/path)? — path stops at whitespace, quotes,
    * or closing angle bracket (anchor-tag context).
    */
  val UrlRe = """https?://[A-Za-z0-9.-]+(/[^\s"'<>]*)?"""

  def plantUrls: Column = {
    val id = col("doc_id").cast("string")
    concat(
      col("text"),
      lit(" see https://host"), (col("doc_id") % 23).cast("string"),
      lit(".example"), (col("doc_id") % 7).cast("string"), lit(".com/p/"), id,
      when(col("doc_id") % 2 === 0,
        concat(lit(" <a href=\"http://www.site"), (col("doc_id") % 11).cast("string"),
          lit(".org/q\">link</a>"))).otherwise(lit("")),
      when(col("doc_id") % 3 === 0,
        concat(lit(" and https://cdn.assets"), (col("doc_id") % 5).cast("string"),
          lit(".net"))).otherwise(lit("")))
  }

  def plantUrlsSql: String =
    s"""SELECT doc_id,
       |  text || ' see https://host' || CAST(doc_id % 23 AS VARCHAR) ||
       |  '.example' || CAST(doc_id % 7 AS VARCHAR) || '.com/p/' || CAST(doc_id AS VARCHAR) ||
       |  CASE WHEN doc_id % 2 = 0
       |       THEN ' <a href="http://www.site' || CAST(doc_id % 11 AS VARCHAR) || '.org/q">link</a>'
       |       ELSE '' END ||
       |  CASE WHEN doc_id % 3 = 0
       |       THEN ' and https://cdn.assets' || CAST(doc_id % 5 AS VARCHAR) || '.net'
       |       ELSE '' END AS t
       |FROM documents""".stripMargin

  /** host = authority up to the first `/`; registrable domain = last two
    * dot-labels (the heuristic form — a public-suffix list is a lookup
    * TABLE joined in at deploy time, not different plumbing).
    */
  def hostOf(url: Column): Column =
    regexp_extract(url, "^https?://([^/]+)", 1)
  def domainOf(host: Column): Column =
    regexp_extract(host, "([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)$", 1)

  /** (doc_id, url, host, domain) — one row per extracted URL. */
  def extracted(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.widen(Tables.documents(spark, dir))
      .select(col("doc_id"), plantUrls.as("t"))
      .select(col("doc_id"), explode(regexp_extract_all(col("t"), lit(UrlRe), lit(0))).as("url"))
      .select(col("doc_id"), col("url"),
        hostOf(col("url")).as("host"))
      .withColumn("domain", domainOf(col("host")))

  /** Per-domain in-degree: distinct linking docs + total links — the
    * link-graph aggregate crawl caps and popularity priors read.
    */
  def domainInDegree(spark: SparkSession, dir: String): DataFrame =
    extracted(spark, dir)
      .groupBy(col("domain"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_links"))

  /** SQL-literal escape: the URL regex's character class contains an
    * apostrophe (attribute context), which must double inside DuckDB's
    * single-quoted string.
    */
  private def sqlRe(re: String): String = re.replace("'", "''")

  private def extractedSql: String =
    s"""WITH planted AS ($plantUrlsSql),
       |urls AS (
       |  SELECT doc_id, unnest(regexp_extract_all(t, '${sqlRe(UrlRe)}')) AS url FROM planted
       |),
       |hosts AS (
       |  SELECT doc_id, url, regexp_extract(url, '^https?://([^/]+)', 1) AS host FROM urls
       |)
       |SELECT doc_id, url, host,
       |  regexp_extract(host, '([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)$$', 1) AS domain
       |FROM hosts""".stripMargin

  def extractedOracle: String = extractedSql

  def inDegreeOracle: String =
    s"""SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  count(*) AS n_links
       |FROM ($extractedSql) GROUP BY domain""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_url_extract" -> ((s, dir) => extracted(s, dir)),
    "q_url_indegree" -> ((s, dir) => domainInDegree(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "q_url_extract" -> extractedOracle,
    "q_url_indegree" -> inDegreeOracle
  )
}
