package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** WARC shard ingestion (see [[graft.plans.WarcRecords]]) — plant
  * multi-record WARC blobs from the fixture text, walk them back by
  * Content-Length framing, explode to one row per record. The plant
  * covers the variations a real CommonCrawl shard has: multiple
  * records per blob, a header the parser must skip (WARC-Date), a
  * record with NO target URI (conversion records), payloads whose
  * content could be mistaken for headers if framing were done by
  * pattern matching instead of declared length.
  *
  * Scale shape: map + explode, no shuffle; a 100 TB crawl ingests as
  * one pass with per-record rows feeding the hygiene funnel directly.
  */
object Warc {

  private val Crlf = "\r\n"

  /** The three per-document records, separately (the gzip gate wraps
    * each in its OWN member, the CommonCrawl layout).
    */
  def plantRecords: Seq[Column] = {
    val id = col("doc_id")
    val text = coalesce(col("text"), lit(""))
    val uri = concat(lit("http://host"), (id % 23).cast("string"),
      lit(".example.com/p/"), id.cast("string"))
    def rec(headers: Column, payload: Column): Column = concat(
      lit("WARC/1.0" + Crlf),
      headers,
      lit("Content-Length: "), octet_length(payload).cast("string"), lit(Crlf),
      lit(Crlf),
      payload, lit(Crlf + Crlf))
    val r0 = rec(
      concat(lit("WARC-Type: response" + Crlf),
        lit("WARC-Target-URI: "), uri, lit(Crlf)),
      text)
    val r1 = rec(
      concat(lit("WARC-Type: metadata" + Crlf),
        lit("WARC-Date: 2026-08-14T00:00:00Z" + Crlf), // parser must skip
        lit("WARC-Target-URI: "), uri, lit("/meta"), lit(Crlf)),
      concat(lit("fetched "), id.cast("string")))
    val r2 = rec(
      lit("WARC-Type: conversion" + Crlf), // no URI header → null uri
      upper(substring(text, 1, 40)))
    Seq(r0, r1, r2)
  }

  /** Three concatenated records per document. */
  def plantWarc: Column = concat(plantRecords: _*)

  private def gzipped(c: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.plans.GzipBytes(
        org.apache.spark.sql.GraftColumnShim.expression(c)))

  private def gunzipped(c: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.plans.GunzipText(
        org.apache.spark.sql.GraftColumnShim.expression(c)))

  /** The `.warc.gz` path: each record its OWN gzip member, members
    * concatenated (the CommonCrawl shard layout — a single-member
    * reader drops the tail), decoded multi-member, then the SAME walk
    * and the SAME oracle as [[warcRecords]]: compression must be
    * content-transparent end to end.
    */
  def warcGzipRecords(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.widen(Tables.documents(spark, dir))
      .select(col("doc_id"),
        concat(plantRecords.map(gzipped): _*).as("gz"))
      .select(col("doc_id"),
        org.apache.spark.sql.GraftColumnShim.column(
          graft.plans.WarcRecords(
            org.apache.spark.sql.GraftColumnShim.expression(
              gunzipped(col("gz"))))).as("recs"))
      .select(col("doc_id"), posexplode(col("recs")).as(Seq("rec_idx", "r")))
      .select(col("doc_id"),
        col("rec_idx").cast("int").as("rec_idx"),
        col("r").getField("rec_type").as("rec_type"),
        col("r").getField("uri").as("uri"),
        col("r").getField("content_length").as("content_length"),
        col("r").getField("payload").as("payload"))

  /** (doc_id, rec_idx, rec_type, uri, content_length, payload). */
  def warcRecords(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.widen(Tables.documents(spark, dir))
      .select(col("doc_id"),
        org.apache.spark.sql.GraftColumnShim.column(
          graft.plans.WarcRecords(
            org.apache.spark.sql.GraftColumnShim.expression(plantWarc))).as("recs"))
      .select(col("doc_id"), posexplode(col("recs")).as(Seq("rec_idx", "r")))
      .select(col("doc_id"),
        col("rec_idx").cast("int").as("rec_idx"),
        col("r").getField("rec_type").as("rec_type"),
        col("r").getField("uri").as("uri"),
        col("r").getField("content_length").as("content_length"),
        col("r").getField("payload").as("payload"))

  def warcOracle: String =
    s"""WITH e AS (
       |  SELECT doc_id, coalesce(text, '') AS t,
       |    'http://host' || CAST(doc_id % 23 AS VARCHAR) || '.example.com/p/' ||
       |      CAST(doc_id AS VARCHAR) AS uri,
       |    unnest(range(3)) AS k
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(k AS INTEGER) AS rec_idx,
       |  CASE k WHEN 0 THEN 'response' WHEN 1 THEN 'metadata' ELSE 'conversion' END AS rec_type,
       |  CASE k WHEN 0 THEN uri WHEN 1 THEN uri || '/meta' ELSE NULL END AS uri,
       |  -- Content-Length counts BYTES (strlen), not code points: the
       |  -- ASCII fixture hides the difference, the contract does not
       |  CAST(CASE k WHEN 0 THEN strlen(t)
       |       WHEN 1 THEN strlen('fetched ' || CAST(doc_id AS VARCHAR))
       |       ELSE strlen(upper(substr(t, 1, 40))) END AS BIGINT) AS content_length,
       |  CASE k WHEN 0 THEN t
       |       WHEN 1 THEN 'fetched ' || CAST(doc_id AS VARCHAR)
       |       ELSE upper(substr(t, 1, 40)) END AS payload
       |FROM e""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_warc_records" -> ((s, dir) => warcRecords(s, dir)),
    "q_warc_gzip" -> ((s, dir) => warcGzipRecords(s, dir)))

  def oracleSql: Map[String, String] = Map(
    "q_warc_records" -> warcOracle,
    // compression is content-transparent: the gz path answers to the
    // identical oracle
    "q_warc_gzip" -> warcOracle)
}
