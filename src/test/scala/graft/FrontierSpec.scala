package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Frontier

class FrontierSpec extends SparkSuite {

  test("bloom path is BIT-IDENTICAL to the exact anti join") {
    val exact = Frontier.newUrls(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val bloom = Frontier.newUrlsBloom(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(exact == bloom)
    assert(exact.nonEmpty, "fixture must yield some genuinely-new URLs")
  }

  test("no yesterday key survives; every admitted key is genuinely unseen") {
    val seen = Frontier.urlKeys(spark, Sf).filter(col("doc_id") % 2 === 0)
      .select("url_key").collect().map(_.getString(0)).toSet
    val admitted = Frontier.newUrls(spark, Sf).collect()
    admitted.foreach { r =>
      assert(r.getLong(0) % 2 == 1, "only today's (odd) docs may be admitted")
      assert(!seen.contains(r.getString(1)), s"seen key admitted: ${r.getString(1)}")
    }
    // and the filter actually bites: some odd doc's key WAS seen
    val odd = Frontier.urlKeys(spark, Sf).filter(col("doc_id") % 2 === 1).count()
    assert(admitted.length < odd, "overlap must exist for the filter to matter")
  }

  test("bloom plan: might_contain prefilter present, sketch is a literal") {
    val plan = Frontier.newUrlsBloom(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "map-side Bloom reject must appear")
    assert(plan.contains("Union"), "definitely-new bypasses the verify join")
  }

  test("bloom path admits EVERYTHING on an empty seen set (null-sketch guard)") {
    // BloomFilterAggregate over zero rows yields a NULL sketch;
    // might_contain on it is null and fails BOTH branch filters — an
    // all-new day must not silently empty the frontier (ADVICE r9)
    val keys = Frontier.urlKeys(spark, Sf)
    val today = keys.filter(col("doc_id") % 2 === 1)
    val emptySeen = keys.filter(lit(false)).select("url_key")
    val admitted = Frontier.newUrlsBloomFrom(today, emptySeen).count()
    assert(admitted == today.count(), "empty 'yesterday' must admit all of today")
  }

  test("recrawl: new OR stale survive, fresh-enough drop, schedule offsets hold") {
    val keys = Frontier.urlKeys(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val lastFetch = keys.filter(_._1 % 2 == 0)
      .groupBy(_._2).map { case (k, rs) =>
        k -> rs.map { case (id, _) => s"2026-0${id % 7 + 1}-10" }.max }
    val rows = Frontier.recrawl(spark, Sf).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    keys.filter(_._1 % 2 == 1).foreach { case (id, key) =>
      val lastmod = s"2026-0${id % 7 + 1}-15"
      val keep = lastFetch.get(key).forall(f => lastmod > f)
      assert(byId.contains(id) == keep, s"doc $id keep=$keep")
      byId.get(id).foreach { r =>
        assert(r.getAs[String]("reason") ==
          (if (lastFetch.contains(key)) "stale" else "new"))
      }
    }
    assert(rows.length < keys.count(_._1 % 2 == 1),
      "the staleness filter must drop some fresh-enough URL")
    assert(rows.exists(_.getAs[String]("reason") == "stale") &&
      rows.exists(_.getAs[String]("reason") == "new"))
    // scheduling contract within each host: contiguous seq, running sum
    ScheduleChecks.assertPoliteSchedule(rows.toSeq)
  }

  test("snapshot delta: every key classified correctly, all four statuses occur") {
    val keys = Frontier.urlKeys(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def latest(par: Int) = keys.filter(_._1 % 2 == par)
      .groupBy(_._2).map { case (k, rs) =>
        val d = rs.map(_._1).max; k -> (d, d / 300) }
    val (y, t) = (latest(0), latest(1))
    val rows = Frontier.snapshotDelta(spark, Sf).collect()
    assert(rows.length == (y.keySet ++ t.keySet).size)
    rows.foreach { r =>
      val k = r.getAs[String]("url_key")
      val expected = (y.get(k), t.get(k)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some((_, a)), Some((_, b))) => if (a == b) "unchanged" else "changed"
        case _ => fail(s"unknown key $k")
      }
      assert(r.getAs[String]("status") == expected, k)
      assert(Option(r.getAs[java.lang.Long]("old_doc")).map(_.toLong) == y.get(k).map(_._1), k)
      assert(Option(r.getAs[java.lang.Long]("new_doc")).map(_.toLong) == t.get(k).map(_._1), k)
    }
    val statuses = rows.map(_.getAs[String]("status")).toSet
    assert(statuses == Set("added", "removed", "changed", "unchanged"),
      s"fixture must exercise all four outcomes, got $statuses")
  }

  test("revisit policy: per-key change rate recomputed, buckets non-vacuous") {
    val keys = Frontier.urlKeys(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = keys.groupBy(_._2).map { case (k, rs) =>
      // latest revision per generation, compared along the gen order
      val revByGen = rs.map(_._1).groupBy(_ % 4)
        .map { case (g, ids) => g -> ids.max / 300 }.toSeq.sortBy(_._1).map(_._2)
      val pairs = revByGen.sliding(2).filter(_.length == 2).toSeq
      val obs = pairs.length
      val changes = pairs.count(p => p(0) != p(1))
      val bucket =
        if (obs == 0) "unknown"
        else if (changes * 3 >= obs * 2) "hot"
        else if (changes * 3 >= obs) "warm"
        else "cold"
      k -> ((obs, changes, bucket))
    }
    val rows = Frontier.revisitPolicy(spark, Sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val k = r.getAs[String]("url_key")
      assert((r.getAs[Int]("obs"), r.getAs[Int]("changes"),
        r.getAs[String]("revisit")) == expected(k), k)
    }
    val buckets = rows.map(_.getAs[String]("revisit")).toSet
    assert(buckets.contains("unknown") && buckets.contains("hot") &&
      (buckets.contains("cold") || buckets.contains("warm")),
      s"fixture too uniform: $buckets")
  }

  test("recrawl plan: one scheduling exchange on host, no cartesian") {
    val plan = Frontier.recrawl(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "history join must be keyed")
    assert("hashpartitioning\\(host".r.findAllIn(plan).length == 1,
      s"exactly one per-host scheduling exchange:\n$plan")
  }
}
