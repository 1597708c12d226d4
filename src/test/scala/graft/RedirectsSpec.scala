package graft

import graft.pipelines.Redirects

class RedirectsSpec extends SparkSuite {

  test("resolution matches an exact reference walk; all outcomes occur") {
    val ids = Tables.documents(spark, Sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // the plant's Location target: %61==13 points FORWARD (the cycle
    // plant — and chains passing through such a node divert into the
    // cycle too), everything else to the previous doc
    def next(j: Long) = if (j % 61 == 13) j + 1 else j - 1
    def expected(id: Long): (Long, Int, String) = {
      var cur = id; var hops = 0
      for (_ <- 1 to Redirects.MaxHops)
        if (ids.contains(cur) && cur % 7 != 0) { cur = next(cur); hops += 1 }
      (cur, hops,
        if (ids.contains(cur) && cur % 7 == 0) "ok" else "unresolved")
    }
    val rows = Redirects.resolve(spark, Sf).collect()
    assert(rows.length == ids.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (cur, hops, status) = expected(id)
      assert(r.getAs[String]("final_url").endsWith(s"/p$cur") &&
        r.getAs[Int]("hops") == hops &&
        r.getAs[String]("final_status") == status, s"doc $id")
    }
    // non-vacuous: terminals, full-budget successes, and failures all occur
    val got = rows.map(r => (r.getAs[Int]("hops"), r.getAs[String]("final_status")))
    assert(got.contains((0, "ok")))
    assert(got.contains((Redirects.MaxHops, "ok")))
    assert(got.exists(_._2 == "unresolved"))
  }

  test("plan: keyed hash joins only — a redirect walk must never go cartesian") {
    val plan = Redirects.resolve(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"non-keyed join in redirect resolution:\n$plan")
  }
}
