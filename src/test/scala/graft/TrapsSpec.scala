package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Traps

class TrapsSpec extends SparkSuite {

  test("templating collapses digit runs and sorts distinct param names") {
    import spark.implicits._
    val got = Traps.templated(Seq(
      ("https://a.example.com/cal/2025/8/31?sess=91&b=2", 1L),
      ("https://a.example.com/cal/2026/12/1?b=7&sess=4", 1L),
      ("https://B.example.com/plain", 2L))
      .toDF("url", "fp"))
      .select("host", "template").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got(0) == ("a.example.com", "/cal/#/#/#?b,sess"))
    assert(got(1) == ("a.example.com", "/cal/#/#/#?b,sess"), "param order must not matter")
    assert(got(2) == ("b.example.com", "/plain"))
  }

  test("trap flag: many URLs over constant content trips; diverse content never does") {
    import spark.implicits._
    val log = (1 to 40).map(i => (s"https://t.example.com/cal/2025/$i?sess=$i", 7L)) ++
      (1 to 40).map(i => (s"https://t.example.com/article/$i", 100L + i)) ++
      Seq(("https://t.example.com/one?x=1", 1L)) // below MinUrls
    val rep = Traps.trapReport(log.toDF("url", "fp")).collect()
      .map(r => r.getAs[String]("template") ->
        ((r.getAs[Long]("urls"), r.getAs[Long]("contents"), r.getAs[Int]("trap")))).toMap
    assert(rep("/cal/#/#?sess") == ((40L, 1L, 1)))
    assert(rep("/article/#") == ((40L, 40L, 0)))
    assert(rep("/one?x") == ((1L, 1L, 0)), "tiny families never flag")
  }

  test("fixture replay: every (host, template) family matches a driver-side recompute") {
    val ids = Tables.documents(spark, Sf).select("doc_id").collect().map(_.getLong(0))
    def host(id: Long) = s"site${id % 13}.example.com"
    def template(id: Long) = (id % 4) match {
      case 0 => "/cal/#/#/#?sess"
      case 1 => "/search?filter,page,sort"
      case 2 => "/article/#"
      case _ => "/about#"
    }
    val expected = ids.groupBy(id => (host(id), template(id))).map { case (k, members) =>
      val urls = members.map { id => (id % 4) match {
        case 0 => s"${id % 12 + 1}/${id % 28 + 1}?sess=$id"
        case 1 => s"${(id / 4) % 50}&${id % 3}&f${id % 7}"
        case 2 => s"$id"
        case _ => s"${id % 3}"
      }}.distinct.size.toLong
      val fps = members.map { id => (id % 4) match {
        case 0 => id % 13
        case 1 => 1000 + id % 5
        case 2 => 2000 + id
        case _ => 3000 + id % 3
      }}.distinct.size.toLong
      k -> ((urls, fps,
        if (urls >= Traps.MinUrls && fps * Traps.MaxDiversityDenom <= urls) 1 else 0))
    }
    val got = Traps.report(spark, Sf).collect()
      .map(r => (r.getAs[String]("host"), r.getAs[String]("template")) ->
        ((r.getAs[Long]("urls"), r.getAs[Long]("contents"), r.getAs[Int]("trap")))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) == v, s"family $k") }
    assert(got.values.exists(_._3 == 1) == expected.values.exists(_._3 == 1))
  }

  test("plan shape: per-row templating, ONE aggregation exchange family (no join, no cartesian)") {
    val plan = Traps.report(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // the two distinct counts plan as Expand + partial/final aggregate;
    // everything between scan and result is one exchange chain keyed on
    // the family — pin the exchange count so a regression can't hide
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <= 2 aggregation exchanges, got $exchanges\n$plan")
  }

  test("trap screen: admitted set = all candidates minus trap-family members; broadcast anti-join") {
    val admitted = Traps.screened(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val report = Traps.report(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getInt(4)))).toMap
    val trapFams = report.filter(_._2._2 == 1).keySet
    assert(trapFams.nonEmpty, "fixture must contain traps")
    admitted.foreach { case (h, t, _) =>
      assert(!trapFams.contains((h, t)), s"trap family ($h, $t) leaked through")
    }
    val expectedCount = report.filter(_._2._2 == 0).values.map(_._1).sum
    assert(admitted.length.toLong == expectedCount,
      "every non-trap candidate must be admitted exactly once")
    val plan = Traps.screened(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      "the trap set must broadcast\n" + plan)
  }
}
