package graft

import org.apache.spark.sql.functions._
import graft.text.Anchors

class AnchorsSpec extends SparkSuite {

  test("edges: href forms resolve through ResolveUrl; anchor text trimmed, case kept") {
    import spark.implicits._
    val html = """<html><body>
      |<a class="x" href="../t/5"> click here </a>
      |<a href="/t/9">Widget 9</a>
      |<a href="http://ext1.example.org/t/6">widget 6</a>
      |</body></html>""".stripMargin
    val got = Anchors.anchorEdges(
      Seq(("http://h2.example.com/dir/page3", html)).toDF("base", "html"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      ("h2.example.com", "http://h2.example.com/t/5", "click here"),
      ("h2.example.com", "http://h2.example.com/t/9", "Widget 9"),
      ("h2.example.com", "http://ext1.example.org/t/6", "widget 6")))
  }

  test("consensus: most frequent anchor wins, ties break lexicographically") {
    import spark.implicits._
    val edges = Seq(
      ("a.com", "T", "beta"), ("b.com", "T", "beta"),
      ("c.com", "T", "alpha"), ("a.com", "T", "alpha"),
      ("a.com", "U", "only")).toDF("src_host", "target", "anchor")
    val rep = Anchors.anchorReport(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
    // T: alpha and beta both 2 — lexicographic tie-break picks alpha
    assert(rep("T") == ((4L, 3L, "alpha", 2L)))
    assert(rep("U") == ((1L, 1L, "only", 1L)))
  }

  test("fixture replay: totals and consensus match a driver-side recompute") {
    val ids = Tables.documents(spark, Sf).select("doc_id").collect().map(_.getLong(0))
    val edges = ids.flatMap { id =>
      (1 to (1 + (id % 3)).toInt).map { j =>
        val t = (id * 3 + j * 11) % 40
        val target = if ((id + j) % 3 == 2) s"http://ext${t % 5}.example.org/t/$t"
          else s"http://h${id % 7}.example.com/t/$t"
        val anchor = ((id + 2 * j) % 4) match {
          case 0 => "click here"; case 1 => "read more"
          case 2 => s"Widget $t"; case _ => s"widget $t"
        }
        (s"h${id % 7}.example.com", target, anchor)
      }
    }
    val expected = edges.groupBy(_._2).map { case (target, es) =>
      val byAnchor = es.groupBy(_._3).view.mapValues(_.size).toMap
      val (topA, topC) = byAnchor.toSeq.minBy { case (a, c) => (-c, a) }
      target -> ((es.size.toLong, es.map(_._1).distinct.size.toLong, topA, topC.toLong))
    }
    val got = Anchors.report(spark, Sf).collect()
      .map(r => r.getAs[String]("target") ->
        ((r.getAs[Long]("inlinks"), r.getAs[Long]("src_hosts"),
          r.getAs[String]("top_anchor"), r.getAs[Long]("top_count")))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) == v, s"target $k") }
  }

  test("plan shape: no cartesian; the join is target-keyed on co-partitioned aggregates") {
    val plan = Anchors.report(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 4, s"expected <= 4 exchanges, got $exchanges\n$plan")
  }
}
