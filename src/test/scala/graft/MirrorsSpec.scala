package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Mirrors

class MirrorsSpec extends SparkSuite {

  test("mirrors flag on overlap; partial overlap below the bar stays unflagged") {
    import spark.implicits._
    val pages =
      (1 to 10).map(i => ("a.com", 100L + i)) ++   // a ≡ b (10 shared)
      (1 to 10).map(i => ("b.com", 100L + i)) ++
      (1 to 10).map(i => ("c.com", 200L + i)) ++   // c ∩ d = 2 of 10
      (1 to 2).map(i => ("d.com", 200L + i)) ++
      (3 to 10).map(i => ("d.com", 300L + i))
    val rep = Mirrors.mirrorReport(pages.toDF("host", "fp")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    assert(rep(("a.com", "b.com")) == ((10L, 10L, 10L, 1)))
    assert(rep(("c.com", "d.com")) == ((2L, 10L, 10L, 0)), "2/10 overlap must not flag")
    assert(!rep.contains(("a.com", "c.com")), "disjoint hosts never pair")
  }

  test("stop-fp cap: a fingerprint on too many hosts never creates pairs") {
    import spark.implicits._
    // 12 hosts all share fp 1 (> MaxHostsPerFp) — no pairs at all
    val pages = (0 until 12).map(h => (s"h$h.com", 1L))
    assert(Mirrors.mirrorReport(pages.toDF("host", "fp")).count() == 0)
  }

  test("fixture replay: exactly the ten planted mirror pairs flag, nothing else") {
    val rows = Mirrors.report(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(5)).toMap
    val flagged = rows.filter(_._2 == 1).keys.toSet
    // planted mirrors: m{h} ≡ m{h+20} for h in 0..9 (string order varies:
    // "m0" < "m20" but also e.g. "m19" vs...: mirrors pair h with h+20)
    val expected = (0 until 10).map { h =>
      val (a, b) = (s"m$h.example.com", s"m${h + 20}.example.com")
      if (a < b) (a, b) else (b, a)
    }.toSet
    assert(flagged == expected, s"flagged=$flagged")
    // nothing outside the planted mirror pairs shares post-cap content
    assert(rows.keySet == expected)
  }

  test("plan shape: pair join shuffles on fp only; host totals broadcast; no cartesian") {
    val plan = Mirrors.report(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), "host totals must broadcast\n" + plan)
  }
}
