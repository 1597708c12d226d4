package graft

import org.apache.spark.sql.functions._
import graft.sources.Warc

class WarcSpec extends SparkSuite {

  private def parse(blob: String) = {
    import spark.implicits._
    Seq(blob).toDF("b")
      .select(org.apache.spark.sql.GraftColumnShim.column(
        graft.plans.WarcRecords(
          org.apache.spark.sql.GraftColumnShim.expression(col("b")))).as("recs"))
      .select(explode(col("recs")).as("r")).select("r.*").collect()
  }

  test("framing is by Content-Length, not pattern: header-looking payloads survive") {
    val payload = "WARC/1.0\r\nWARC-Type: fake\r\n\r\nnot a record"
    val blob = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://a/\r\n" +
      s"Content-Length: ${payload.getBytes.length}\r\n\r\n" + payload + "\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    val rows = parse(blob)
    assert(rows.length == 2, "the fake inner record must stay inside payload 1")
    assert(rows(0).getAs[String]("payload") == payload)
    assert(rows(1).getAs[String]("rec_type") == "metadata")
    assert(rows(1).getAs[String]("payload") == "ok")
  }

  test("truncated trailing record: whole records before the damage still parse") {
    val good = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"
    val bad = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999\r\n\r\nshort"
    val rows = parse(good + bad)
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("payload") == "abc")
    assert(parse("garbage").isEmpty)
  }

  test("multibyte payloads: Content-Length counts bytes, slices stay valid UTF-8") {
    val payload = "héllo 中文"
    val blob = "WARC/1.0\r\ncontent-length: " + payload.getBytes("UTF-8").length +
      "\r\nWarc-Type: response\r\n\r\n" + payload + "\r\n\r\n"
    val rows = parse(blob) // also: header names in mixed case
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("payload") == payload)
    assert(rows(0).getAs[Long]("content_length") == payload.getBytes("UTF-8").length)
  }

  test("gated query: three records per doc with the planted fields") {
    val rows = Warc.warcRecords(spark, Sf).filter(col("doc_id") === 7).orderBy("rec_idx").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("rec_type")).toSeq ==
      Seq("response", "metadata", "conversion"))
    assert(rows(1).getAs[String]("uri").endsWith("/meta"))
    assert(rows(2).isNullAt(rows(2).fieldIndex("uri")))
    assert(rows(2).getAs[String]("payload") ==
      rows(0).getAs[String]("payload").take(40).toUpperCase)
  }

  test("warc.gz path: per-record gzip members decode to the identical record set") {
    val plain = Warc.warcRecords(spark, Sf).orderBy("doc_id", "rec_idx").collect()
    val gz = Warc.warcGzipRecords(spark, Sf).orderBy("doc_id", "rec_idx").collect()
    assert(plain.length == gz.length && plain.length > 0)
    plain.zip(gz).foreach { case (a, b) => assert(a == b) }
  }

  test("gunzip: multi-member concatenation, garbage, and bomb cap") {
    import spark.implicits._
    def gunzip(b: Array[Byte]): Option[String] = {
      val r = Seq(b).toDF("b").select(
        org.apache.spark.sql.GraftColumnShim.column(
          graft.plans.GunzipText(
            org.apache.spark.sql.GraftColumnShim.expression(col("b"))))).collect()(0)
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }
    import org.apache.spark.unsafe.types.UTF8String
    val m1 = graft.plans.GzipBytes.gzip(UTF8String.fromString("hello "))
    val m2 = graft.plans.GzipBytes.gzip(UTF8String.fromString("world"))
    assert(gunzip(m1 ++ m2).contains("hello world"), "all members must decode")
    assert(gunzip("not gzip".getBytes).isEmpty)
    assert(gunzip(m1.dropRight(3)).isEmpty, "truncated member -> null")
    // decompression bomb: > 64 MiB of output from a tiny input
    val bomb = graft.plans.GzipBytes.gzip(
      UTF8String.fromString("a" * (graft.plans.GunzipText.MaxOutputBytes + 1024)))
    assert(bomb.length < (1 << 20), "bomb input itself must be small")
    assert(gunzip(bomb).isEmpty, "over-cap output -> null, not OOM")
  }

  test("magic sniffing routes all 14 planted kinds") {
    val rows = graft.multimodal.Multimodal.magicFormats(spark, Sf)
      .orderBy("doc_id").limit(42).collect()
    val exp = Seq("png", "gif", "jpeg", "pdf", "gzip", "zip", "wav", "avi",
      "mp4", "warc", "xml", "text-bom", "zstd", "unknown")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("format") == exp((id % 14).toInt), s"doc $id")
    }
  }

  test("plan is map + explode, no shuffle") {
    val plan = Warc.warcRecords(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"))
    assert(plan.contains("Generate"), "explode should plan as Generate")
  }
}
