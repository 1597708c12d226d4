package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.sources.{Warc, WarcWriter}

class WarcWriterSpec extends SparkSuite {

  private def sha256hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  private def writeParse(recType: String, uri: Option[String], payload: String) = {
    import spark.implicits._
    val df = Seq(payload).toDF("p")
      .select(WarcWriter.record(lit(recType),
        uri.map(lit(_)).getOrElse(lit(null).cast("string")), col("p")).as("rec"))
      .select(col("rec"),
        org.apache.spark.sql.GraftColumnShim.column(graft.plans.WarcRecords(
          org.apache.spark.sql.GraftColumnShim.expression(col("rec")))).as("recs"))
    val row = df.collect()(0)
    val recs = row.getSeq[org.apache.spark.sql.Row](1)
    (row.getString(0), recs)
  }

  test("write → parse roundtrip: fields survive, including the null-URI record") {
    val (_, recs) = writeParse("conversion", None, "some payload")
    assert(recs.length == 1)
    val r = recs.head
    assert(r.getAs[String]("rec_type") == "conversion")
    assert(r.getAs[String]("uri") == null)
    assert(r.getAs[Long]("content_length") == 12L)
    assert(r.getAs[String]("payload") == "some payload")
  }

  test("Content-Length frames BYTES: multibyte payloads parse back whole") {
    val payload = "hälö こん" // 2-byte umlauts + 3-byte kana
    val nBytes = payload.getBytes(StandardCharsets.UTF_8).length
    assert(nBytes > payload.length) // the test is vacuous otherwise
    val (raw, recs) = writeParse("response", Some("http://x/y"), payload)
    assert(raw.contains(s"Content-Length: $nBytes\r\n"))
    assert(recs.head.getAs[Long]("content_length") == nBytes.toLong)
    assert(recs.head.getAs[String]("payload") == payload)
  }

  test("empty payload: zero-length framing still parses") {
    val (raw, recs) = writeParse("metadata", Some("http://x/m"), "")
    assert(raw.contains("Content-Length: 0\r\n"))
    assert(recs.head.getAs[Long]("content_length") == 0L)
    assert(recs.head.getAs[String]("payload") == "")
  }

  test("the stamped digest is the payload's sha-256 (reference: MessageDigest)") {
    for (p <- Seq("some payload", "", "hälö こん")) {
      val (raw, _) = writeParse("response", Some("http://x/y"), p)
      val written = WarcWriter.DigestRe.r.findFirstMatchIn(raw).map(_.group(1))
      assert(written.contains(sha256hex(p)), s"payload <$p>")
    }
  }

  test("gz members: per-record gzip shard reads back through the multi-member reader") {
    import spark.implicits._
    val df = Seq(("a payload", "second one")).toDF("p1", "p2")
      .select(concat(
        WarcWriter.gzMember(lit("response"), lit("http://x/1"), col("p1")),
        WarcWriter.gzMember(lit("metadata"), lit("http://x/2"), col("p2"))).as("gz"))
      .select(org.apache.spark.sql.GraftColumnShim.column(graft.plans.WarcRecords(
        org.apache.spark.sql.GraftColumnShim.expression(
          org.apache.spark.sql.GraftColumnShim.column(graft.plans.GunzipText(
            org.apache.spark.sql.GraftColumnShim.expression(col("gz"))))))).as("recs"))
    val recs = df.collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(recs.map(_.getAs[String]("payload")) == Seq("a payload", "second one"))
    assert(recs.map(_.getAs[String]("rec_type")) == Seq("response", "metadata"))
  }

  test("q_warc_write: three records per doc, digests verify, conversion URI-less") {
    val rows = WarcWriter.writtenRecords(spark, Sf).collect()
    val n = Tables.documents(spark, Sf).count()
    assert(rows.length == 3 * n)
    rows.foreach { r =>
      // the digest column came from the RAW record text; re-derive from
      // the PARSED payload — writer and parser agree end to end
      assert(r.getAs[String]("digest") == sha256hex(r.getAs[String]("payload")),
        s"doc ${r.getAs[Long]("doc_id")} rec ${r.getAs[Int]("rec_idx")}")
      if (r.getAs[String]("rec_type") == "conversion")
        assert(r.getAs[String]("uri") == null)
      else assert(r.getAs[String]("uri") != null)
    }
  }

  test("wet: payloads equal the independently-extracted clean text, 200s only") {
    import org.apache.spark.sql.Row
    val wet = WarcWriter.wetRecords(spark, Sf)
      .select("doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = Tables.documents(spark, Sf)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), graft.text.Html.extractText(graft.text.Html.plantHtml))
      .collect().map { case Row(id: Long, t: String) => id -> t }.toMap
    assert(wet == expected)
  }

  test("wat: envelope is real JSON (from_json roundtrip) and links resolve") {
    import spark.implicits._
    val df = WarcWriter.watRecords(spark, Sf)
    val parsed = df.select(col("doc_id"), col("uri"), col("links"),
        from_json(col("wat_json"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "uri STRING, status INT, content_type STRING, links ARRAY<STRING>"))
          .as("j"))
      .collect()
    parsed.foreach { r =>
      val j = r.getStruct(3)
      assert(j.getAs[String]("uri") == r.getString(1), "envelope uri")
      val links = j.getSeq[String](3)
      assert(links.length == 2)
      val id = r.getLong(0)
      assert(links(0) == s"http://host${id % 23}.example.com/p2/${id % 13}",
        "root-relative href resolves onto the target authority")
      assert(links(1) == s"http://ext${id % 5}.org/y", "absolute href passes through")
      assert(r.getString(2) == links.mkString("\u0001"), "scalar join mirrors the array")
    }
  }

  test("plan shape: all three derivations are map-only — zero hash/range exchanges") {
    for ((name, df) <- Seq(
        "q_warc_write" -> WarcWriter.writtenRecords(spark, Sf),
        "q_wet_records" -> WarcWriter.wetRecords(spark, Sf),
        "q_wat_records" -> WarcWriter.watRecords(spark, Sf))) {
      val plan = df.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty, s"$name:\n$plan")
      assert("Exchange rangepartitioning".r.findAllIn(plan).isEmpty, s"$name:\n$plan")
    }
  }

  test("revisit derivation: unchanged refetches emit payload-free revisit records") {
    val rows = graft.sources.WarcWriter.revisitDerived(spark, Sf).collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("rec_type"), r.getAs[Long]("rec_len"), r.getAs[String]("digest")))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (url, (t, len, digest)) =>
      val g = url.split("/").last.toLong
      if (g % 7 == 0) {
        assert(t == "response", s"url $url changed: must carry a full record")
        val payload = s"body $g v2"
        assert(digest == java.security.MessageDigest.getInstance("SHA-256")
          .digest(payload.getBytes).map("%02x".format(_)).mkString, url)
        assert(len > payload.length, "response record must carry the payload")
      } else {
        assert(t == "revisit", s"url $url unchanged: must dedup to a revisit record")
        val payload = s"body $g v1"
        assert(digest == java.security.MessageDigest.getInstance("SHA-256")
          .digest(payload.getBytes).map("%02x".format(_)).mkString, url)
      }
    }
    // revisit records never carry the payload: they are shorter than the
    // SAME url's would-be response record by at least the payload size
    val revisits = rows.filter(_._2._1 == "revisit")
    assert(revisits.nonEmpty && rows.values.exists(_._1 == "response"))
  }
}
