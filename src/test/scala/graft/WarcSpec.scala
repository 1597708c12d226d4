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

  test("plan is map + explode, no shuffle") {
    val plan = Warc.warcRecords(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"))
    assert(plan.contains("Generate"), "explode should plan as Generate")
  }
}
