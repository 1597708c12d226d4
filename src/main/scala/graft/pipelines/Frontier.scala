package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.Canonical

/** Frontier seen-filtering — the dedup between link discovery and fetch
  * scheduling: a crawler must not refetch what yesterday's crawl
  * already took. Frontier identity is the canonical URL's host+path
  * (scheme- and query-insensitive — the conservative refetch-avoidance
  * key), yesterday's crawl is the even-doc half of the fixture, today's
  * discovered batch the odd half; overlap arises naturally from the
  * plant's modular structure (same host+path recurs across parities).
  *
  * Two bit-identical paths, both gated by ONE oracle:
  *   - [[newUrls]]: the exact LEFT ANTI join (seen-set-sized shuffle).
  *   - [[newUrlsBloom]]: the 100 TB shape — yesterday's keys fold into
  *     one fixed-size Bloom sketch held as a driver literal; a map-side
  *     `might_contain` REJECT admits definitely-new URLs with no join
  *     at all (Bloom filters have no false negatives), and only the
  *     maybe-seen sliver (true hits + fpp) meets the seen set in the
  *     exact anti join. The [[graft.text.Contamination]] X103
  *     discipline applied to the frontier.
  */
object Frontier {

  val BloomItems = 100000L
  val BloomBits = 1000000L

  /** (doc_id, url_key) — canonical host+path per discovered URL. */
  def urlKeys(spark: SparkSession, dir: String): DataFrame =
    Canonical.canonicalize(
        graft.ops.ScaleOps.widen(Tables.documents(spark, dir))
          .select(col("doc_id"), CrawlPipeline.plantUri.as("url")))
      .select(col("doc_id"),
        regexp_extract(col("canon"), "^[a-z]+://([^?]+)", 1).as("url_key"))

  /** Exact path: today's (odd) URLs not crawled yesterday (even). */
  def newUrls(spark: SparkSession, dir: String): DataFrame = {
    val keys = urlKeys(spark, dir)
    val seen = keys.filter(col("doc_id") % 2 === 0).select(col("url_key")).distinct()
    keys.filter(col("doc_id") % 2 === 1)
      .join(seen, Seq("url_key"), "left_anti")
      .select(col("doc_id"), col("url_key"))
  }

  /** Bloom-prefiltered path — BIT-IDENTICAL to [[newUrls]]: the sketch
    * rejects (admits as new) with no false negatives; accepted
    * maybe-seen rows are verified exactly.
    */
  def newUrlsBloom(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnShim.{column, expression}
    val keys = urlKeys(spark, dir)
    val seen = keys.filter(col("doc_id") % 2 === 0).select(col("url_key")).distinct()
    // sketch over the key's 64-bit hash, built distributed, held as a
    // constant literal (model-sized regardless of seen-set cardinality)
    val bloomAgg = column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(expression(xxhash64(col("url_key"))),
        expression(lit(BloomItems)), expression(lit(BloomBits)))
      .toAggregateExpression())
    val bf = seen.agg(bloomAgg.as("bf")).collect()(0).getAs[Array[Byte]](0)
    val mightContain = column(
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(bf, org.apache.spark.sql.types.BinaryType),
        expression(xxhash64(col("url_key")))))
    val today = keys.filter(col("doc_id") % 2 === 1)
    val definitelyNew = today.filter(!mightContain)
    val verified = today.filter(mightContain)
      .join(seen, Seq("url_key"), "left_anti")
    definitelyNew.select(col("doc_id"), col("url_key"))
      .unionByName(verified.select(col("doc_id"), col("url_key")))
  }

  /** One oracle gates BOTH paths (the bloom path is exact). */
  def newUrlsOracle: String =
    s"""WITH uris AS (
       |  SELECT doc_id, ${CrawlPipeline.plantUriSqlPublic} AS url FROM documents),
       |${Canonical.canonicalCtesFrom("uris")},
       |keys AS (
       |  SELECT doc_id,
       |    regexp_extract(${Canonical.canonSelectSql}, '^[a-z]+://([^?]+)', 1)
       |      AS url_key
       |  FROM normed),
       |seen AS (SELECT DISTINCT url_key FROM keys WHERE doc_id % 2 = 0)
       |SELECT k.doc_id, k.url_key
       |FROM keys k LEFT JOIN seen s ON k.url_key = s.url_key
       |WHERE k.doc_id % 2 = 1 AND s.url_key IS NULL""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_frontier_new" -> ((s, dir) => newUrls(s, dir)),
    "q_frontier_new_bloom" -> ((s, dir) => newUrlsBloom(s, dir)))

  def oracleSql: Map[String, String] = Map(
    "q_frontier_new" -> newUrlsOracle,
    "q_frontier_new_bloom" -> newUrlsOracle)
}
