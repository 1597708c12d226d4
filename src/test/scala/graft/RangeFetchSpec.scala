package graft

import org.apache.spark.sql.functions._
import graft.pipelines.RangeFetch

class RangeFetchSpec extends SparkSuite {

  private def msg(s: Long, e: Long, total: Long, body: String): String =
    "HTTP/1.1 206 Partial Content\r\n" +
      s"Content-Range: bytes $s-$e/$total\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n$body"

  test("tiling fold: complete stitches, gap fails, OVERLAP fails too") {
    import spark.implicits._
    val rows = Seq(
      ("ok", msg(0, 3, 10, "aaaa")), ("ok", msg(4, 9, 10, "bbbbbb")),
      ("gap", msg(0, 3, 10, "aaaa")), ("gap", msg(6, 9, 10, "bbbb")),
      ("ovl", msg(0, 5, 10, "aaaaaa")), ("ovl", msg(4, 9, 10, "bbbbbb")))
      .toDF("url", "raw")
    val got = RangeFetch.reassemble(rows).collect()
      .map(r => r.getString(0) -> ((r.getAs[Int]("complete"), r.getAs[String]("body")))).toMap
    assert(got("ok") == ((1, "aaaabbbbbb")))
    assert(got("gap")._1 == 0)
    assert(got("ovl")._1 == 0, "overlap must not count as complete")
    // covered_bytes exposes WHY: the overlap case over-covers
    val covered = RangeFetch.reassemble(rows).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("covered_bytes")).toMap
    assert(covered(("ovl")) == 12L && covered(("gap")) == 8L)
  }

  test("fixture replay: lost-middle and corpus-tail URLs are incomplete, the rest stitch exactly") {
    val rows = RangeFetch.reassembled(spark, Sf).collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[Long]("n_parts"), r.getAs[Int]("complete"), r.getAs[String]("body")))).toMap
    val nDocs = Tables.documents(spark, Sf).count()
    rows.foreach { case (url, (nParts, complete, body)) =>
      val u = url.split("/").last.toLong
      val full = s"payload $u abcdefghijklmnopqrstuvwxyz0123456789"
      val expectedParts =
        (0 until 3).count(j => 3 * u + j < nDocs && !(u % 5 == 0 && j == 1))
      assert(nParts == expectedParts, s"url $url")
      assert(complete == (if (expectedParts == 3) 1 else 0), s"url $url")
      if (complete == 1) assert(body == full, s"url $url must stitch byte-exactly")
      else assert(body != full && full.startsWith(body.take(4)), s"url $url")
    }
    assert(rows.values.exists(_._2 == 0) && rows.values.exists(_._2 == 1))
  }

  test("plan shape: one url-keyed aggregation exchange, no join") {
    val plan = RangeFetch.reassembled(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges\n$plan")
  }
}
