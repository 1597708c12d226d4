package graft

import org.apache.spark.sql.functions._
import graft.ops.Attribution

class AttributionSpec extends SparkSuite {

  test("every attributed purchase picks the true most-recent view") {
    val cand = Attribution.candidates(spark, Sf)
      .select("purchase_id", "view_id", "vus", "pus").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = cand.groupBy(_._1).map { case (pid, rows) =>
      val best = rows.maxBy(r => (r._3, r._2))
      pid -> (best._2, best._4 - best._3)
    }
    val got = Attribution.lastTouch(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    assert(got.nonEmpty, "fixture must attribute something")
  }

  test("purchases without a qualifying view are absent, not null-filled") {
    val attributed = Attribution.lastTouch(spark, Sf)
      .select("purchase_id").collect().map(_.getLong(0)).toSet
    val all = Attribution.purchases(spark, Sf)
      .select("purchase_id").collect().map(_.getLong(0)).toSet
    assert(attributed.subsetOf(all))
    assert(attributed.size < all.size,
      "some purchase must fall outside every view's horizon")
  }

  test("plan: user-keyed join + one partial-agg argmax, no window over the join") {
    val plan = Attribution.lastTouch(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("Window "),
      s"last-touch must be a max(struct) aggregate, not a ranking window:\n$plan")
  }

  test("stream-stream join emits the batch candidate set across batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(minutes: Int) = new java.sql.Timestamp(base.getTime + minutes * 60000L)
    // views: user 1 at t0 and t30; user 2 at t0. purchases: user 1 at
    // t40 (two candidates), user 1 at t85 (one: t30 is 55 min back,
    // t0 is 85 — outside), user 2 at t70 (none: 70 min > horizon)
    val vs = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, java.sql.Timestamp)]
    val ps = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, java.sql.Timestamp)]
    val out = graft.streaming.AttributionStream.candidatePairs(
      vs.toDF().toDF("view_id", "user_id", "vts"),
      ps.toDF().toDF("purchase_id", "user_id", "pts"))
    val q = out.writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    // batch 1: the views and ONE purchase
    vs.addData((101L, 1L, ts(0)), (102L, 1L, ts(30)), (201L, 2L, ts(0)))
    ps.addData((901L, 1L, ts(40)))
    q.processAllAvailable()
    // batch 2: late purchases joining against batch-1 view state
    ps.addData((902L, 1L, ts(85)), (903L, 2L, ts(70)))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT purchase_id, view_id, gap_us FROM attr_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val M = 60L * 1000000L
    assert(got == Set(
      (901L, 101L, 40 * M), (901L, 102L, 10 * M), // both views qualify
      (902L, 102L, 55 * M)), // cross-batch pair; 101 is outside the hour
      s"got $got")
  }
}
