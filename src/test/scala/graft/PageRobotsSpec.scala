package graft

import org.apache.spark.sql.functions._
import graft.text.PageRobots

class PageRobotsSpec extends SparkSuite {

  private def directive(raw: String): org.apache.spark.sql.Row = {
    import spark.implicits._
    PageRobots.directives(Seq((1L, raw)).toDF("doc_id", "raw")).collect()(0)
  }

  private def msg(headers: String, body: String): String =
    s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n$headers" +
      s"Content-Length: ${body.length}\r\n\r\n$body"

  test("header and meta channels UNION; none expands; most restrictive wins") {
    val r = directive(msg("X-Robots-Tag: nofollow\r\n",
      "<html><head><meta name=\"robots\" content=\"noindex\"></head><body>x</body></html>"))
    assert((r.getAs[Int]("noindex"), r.getAs[Int]("nofollow"),
      r.getAs[Int]("noarchive"), r.getAs[Int]("channels")) == ((1, 1, 0, 2)))
    val none = directive(msg("",
      "<html><head><meta content=\"none\" name=\"robots\"></head><body>x</body></html>"))
    assert((none.getAs[Int]("noindex"), none.getAs[Int]("nofollow")) == ((1, 1)),
      "none = noindex + nofollow, attribute order flipped")
  }

  test("token matching, not substring: 'nofollowup' and decoy metas never flag") {
    val r = directive(msg("X-Robots-Tag: nofollowup\r\n",
      "<html><head><meta name=\"viewport\" content=\"noindex\"></head><body>x</body></html>"))
    assert((r.getAs[Int]("noindex"), r.getAs[Int]("nofollow"),
      r.getAs[Int]("channels")) == ((0, 0, 1)))
  }

  test("fixture replay: every rotation class lands its documented bits") {
    val rows = PageRobots.report(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("noindex"), r.getAs[Int]("nofollow"),
          r.getAs[Int]("noarchive"), r.getAs[Int]("channels")))).toMap
    rows.foreach { case (id, v) =>
      val expected = (id % 5) match {
        case 0 => (1, 0, 0, 1) // header noindex
        case 1 => (0, 1, 1, 1) // meta nofollow, noarchive
        case 2 => (1, 1, 0, 2) // both channels union
        case 3 => (1, 1, 0, 1) // meta none
        case _ => (0, 0, 0, 0)
      }
      assert(v == expected, s"doc $id")
    }
  }

  test("plan is map-only: no shuffle beyond the deliberate widen, no join") {
    val plan = PageRobots.report(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Join"), plan)
  }
}
