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
      // posexplode_OUTER + null guard: a plain explode makes Catalyst
      // infer a pushable size(recs)>0 that lands BELOW the widen
      // exchange and runs the whole plant+gzip+parse on the narrow
      // pre-widen partitions (see CrawlPipeline.statelessStages)
      .select(col("doc_id"), posexplode_outer(col("recs")).as(Seq("rec_idx", "r")))
      .filter(col("r").isNotNull)
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
      // posexplode_OUTER + null guard: a plain explode makes Catalyst
      // infer a pushable size(recs)>0 that lands BELOW the widen
      // exchange and runs the whole plant+gzip+parse on the narrow
      // pre-widen partitions (see CrawlPipeline.statelessStages)
      .select(col("doc_id"), posexplode_outer(col("recs")).as(Seq("rec_idx", "r")))
      .filter(col("r").isNotNull)
      .select(col("doc_id"),
        col("rec_idx").cast("int").as("rec_idx"),
        col("r").getField("rec_type").as("rec_type"),
        col("r").getField("uri").as("uri"),
        col("r").getField("content_length").as("content_length"),
        col("r").getField("payload").as("payload"))

  private def chunkedPlant(c: Column, size: Int): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.plans.HttpChunkedPlant(
        org.apache.spark.sql.GraftColumnShim.expression(c), size))

  /** WARC response records whose payload is a full HTTP/1.1 message —
    * the real CommonCrawl layout ([[graft.plans.HttpMessage]] docs).
    * Three response shapes, rotating by doc_id:
    *   %3==0 → 200, `Transfer-Encoding: chunked` (7-byte chunks, so
    *            boundaries straddle multibyte characters), charset param
    *   %3==1 → 404, `Content-Length` framing, text/plain
    *   %3==2 → 301, no framing headers (body = rest of payload)
    */
  def plantHttpWarc: Column =
    plantHttpWarc(coalesce(col("text"), lit("")),
      concat(lit("http://host"), (col("doc_id") % 23).cast("string"),
        lit(".example.com/p/"), col("doc_id").cast("string")))

  /** Same plant with caller-chosen body and target URI (the crawl
    * composition plants HTML bodies and messy URIs).
    */
  def plantHttpWarc(body: Column, uri: Column): Column = {
    val id = col("doc_id")
    // the real stack: Content-Encoding gzip INSIDE Transfer-Encoding
    // chunked — the decoder must undo the transfer coding first, then
    // the content coding, then route the charset
    val chunkedMsg = concat(
      lit("HTTP/1.1 200 OK" + Crlf),
      lit("Content-Type: text/html; charset=utf-8" + Crlf),
      lit("Content-Encoding: gzip" + Crlf),
      lit("Transfer-Encoding: chunked" + Crlf),
      lit(Crlf),
      chunkedPlant(gzipped(body).cast("string"), 7))
    val lengthMsg = concat(
      lit("HTTP/1.1 404 Not Found" + Crlf),
      lit("Content-Type: text/plain" + Crlf),
      lit("Content-Length: "), octet_length(body).cast("string"), lit(Crlf),
      lit(Crlf),
      body)
    val bareMsg = concat(
      lit("HTTP/1.1 301 Moved Permanently" + Crlf),
      lit("Location: http://example.org/moved" + Crlf),
      lit("X-Crawl-Note: folded" + Crlf),
      lit("  continuation" + Crlf), // obs-fold the parser must merge
      lit("Content-Type: text/html" + Crlf),
      lit(Crlf),
      body)
    val msg = when(id % 3 === 0, chunkedMsg)
      .when(id % 3 === 1, lengthMsg)
      .otherwise(bareMsg)
    concat(
      lit("WARC/1.0" + Crlf),
      lit("WARC-Type: response" + Crlf),
      lit("WARC-Target-URI: "), uri, lit(Crlf),
      lit("Content-Length: "), octet_length(msg).cast("string"), lit(Crlf),
      lit(Crlf),
      msg, lit(Crlf + Crlf))
  }

  private def httpMessage(c: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.plans.HttpMessage(
        org.apache.spark.sql.GraftColumnShim.expression(c)))

  /** warc.gz → WARC walk → HTTP split: the chain a CommonCrawl shard
    * actually needs. (doc_id, uri, status, content_type, charset,
    * n_headers, headers, body). One map-only pass, no shuffle beyond
    * the deliberate widen.
    */
  def warcHttp(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ScaleOps.widen(Tables.documents(spark, dir))
      .select(col("doc_id"),
        org.apache.spark.sql.GraftColumnShim.column(
          graft.plans.WarcRecords(
            org.apache.spark.sql.GraftColumnShim.expression(
              gunzipped(gzipped(plantHttpWarc))))).as("recs"))
      .select(col("doc_id"), explode_outer(col("recs")).as("r"))
      .filter(col("r").getField("rec_type") === "response")
      .select(col("doc_id"),
        col("r").getField("uri").as("uri"),
        httpMessage(col("r").getField("payload")).as("h"))
      .select(col("doc_id"), col("uri"),
        col("h").getField("status").as("status"),
        col("h").getField("content_type").as("content_type"),
        col("h").getField("charset").as("charset"),
        col("h").getField("content_encoding").as("content_encoding"),
        col("h").getField("n_headers").as("n_headers"),
        col("h").getField("headers").as("headers"),
        col("h").getField("body").as("body"))

  def warcHttpOracle: String =
    s"""SELECT doc_id,
       |  'http://host' || CAST(doc_id % 23 AS VARCHAR) || '.example.com/p/' ||
       |    CAST(doc_id AS VARCHAR) AS uri,
       |  CAST(CASE doc_id % 3 WHEN 0 THEN 200 WHEN 1 THEN 404 ELSE 301 END AS INTEGER) AS status,
       |  CASE doc_id % 3 WHEN 1 THEN 'text/plain' ELSE 'text/html' END AS content_type,
       |  CASE doc_id % 3 WHEN 0 THEN 'utf-8' ELSE NULL END AS charset,
       |  CASE doc_id % 3 WHEN 0 THEN 'gzip' ELSE NULL END AS content_encoding,
       |  CAST(CASE doc_id % 3 WHEN 1 THEN 2 ELSE 3 END AS INTEGER) AS n_headers,
       |  CASE doc_id % 3
       |    WHEN 0 THEN ['content-type: text/html; charset=utf-8',
       |                 'content-encoding: gzip',
       |                 'transfer-encoding: chunked']
       |    WHEN 1 THEN ['content-type: text/plain',
       |                 'content-length: ' || CAST(strlen(coalesce(text, '')) AS VARCHAR)]
       |    ELSE ['location: http://example.org/moved',
       |          'x-crawl-note: folded continuation',
       |          'content-type: text/html']
       |  END AS headers,
       |  coalesce(text, '') AS body
       |FROM documents""".stripMargin

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
    "q_warc_gzip" -> ((s, dir) => warcGzipRecords(s, dir)),
    "q_warc_http" -> ((s, dir) => warcHttp(s, dir)))

  def oracleSql: Map[String, String] = Map(
    "q_warc_records" -> warcOracle,
    // compression is content-transparent: the gz path answers to the
    // identical oracle
    "q_warc_gzip" -> warcOracle,
    "q_warc_http" -> warcHttpOracle)
}
