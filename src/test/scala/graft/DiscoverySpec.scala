package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Discovery

class DiscoverySpec extends SparkSuite {

  private lazy val rows = Discovery.merged(spark, Sf).collect()
    .map(r => r.getAs[String]("canon") ->
      ((r.getAs[Long]("n_sitemap"), r.getAs[Long]("n_feed"),
        Option(r.getAs[java.lang.Long]("first_seen_epoch")).map(_.toLong)))).toMap

  test("messy sitemap spellings and clean feed links reconcile to ONE canonical URL") {
    // every canon key must look fully canonicalized: lowercase, no www,
    // no :80, no trailing slash, no tracking param
    assert(rows.nonEmpty)
    rows.keys.foreach { c =>
      assert(c.matches("http://d\\d+\\.example\\.com/art/\\d+\\?x=1"), c)
    }
    // cross-source reconciliation actually happened: some canon is
    // announced by BOTH a sitemap and a feed
    assert(rows.values.exists(v => v._1 > 0 && v._2 > 0),
      "no cross-source collision — canonicalization failed to reconcile")
  }

  test("fixture replay: counts and earliest timestamp match a driver-side recompute") {
    val ids = Tables.documents(spark, Sf).select("doc_id").collect().map(_.getLong(0))
    def canon(h: Long, slot: Long) = s"http://d$h.example.com/art/$slot?x=1"
    def dayEpoch(m: Long, d: Int) =
      java.time.LocalDate.of(2026, m.toInt, d).atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val ann = ids.flatMap { id =>
      val h = id % 11
      val m = id % 9 + 1
      Seq(
        (canon(h, id % 30), "sitemap", Some(dayEpoch(m, 15))),
        (canon(h, (id + 7) % 30), "sitemap", None),
        (canon(h, (id * 2 + 1) % 30), "feed", Some(dayEpoch(m, 10) + (id % 10) * 3600)),
        (canon(h, (id * 2 + 8) % 30), "feed", None))
    }
    val expected = ann.groupBy(_._1).map { case (c, as) =>
      c -> ((as.count(_._2 == "sitemap").toLong, as.count(_._2 == "feed").toLong,
        as.flatMap(_._3).sorted.headOption))
    }
    assert(rows.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(rows(k) == v, s"canon $k") }
  }

  test("plan shape: one canon-keyed aggregation exchange, no join") {
    val plan = Discovery.merged(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges\n$plan")
  }
}
