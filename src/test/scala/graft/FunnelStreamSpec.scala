package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.{Ev, StageReached}

class FunnelStreamSpec extends SparkSuite {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val T0 = 1754006400000L // 2025-08-01T00:00:00Z
  private val H = 24L * 3600 * 1000

  test("conversion ACROSS micro-batches: the stream replays the serial recurrence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      Ev(1L, "view", ts(T0)), // user 1 converts across three batches
      Ev(2L, "click", ts(T0)), // user 2: click BEFORE any view — never stage 2
      Ev(2L, "view", ts(T0 + 1000)),
      Ev(3L, "view", ts(T0)))
    val batch2 = Seq(
      Ev(1L, "click", ts(T0 + 3600 * 1000)),
      Ev(2L, "purchase", ts(T0 + 2000))) // purchase without a click — no hop
    val batch3 = Seq(
      Ev(1L, "purchase", ts(T0 + 2 * 3600 * 1000)),
      // outside the horizon — no hop (LAST, so its event time cannot
      // advance the watermark past anyone's pending events)
      Ev(3L, "click", ts(T0 + H + 1)))
    val mem = MemoryStream[Ev]
    val q = FunnelStream.funnelStream(mem.toDS())
      .writeStream.format("memory").queryName("funnel").outputMode("append").start()
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    mem.addData(batch3: _*); q.processAllAvailable()
    val got = spark.sql("SELECT user_id, stage, at FROM funnel").as[StageReached]
      .collect()
    q.stop()
    val finalStage = got.groupBy(_.user_id).view.mapValues(_.map(_.stage).max).toMap
    val all = batch1 ++ batch2 ++ batch3
    val expected = all.groupBy(_.user_id).view
      .mapValues(evs => FunnelStream.serialStage(evs.toSeq)).toMap
    assert(finalStage == expected.filter(_._2 > 0))
    assert(finalStage == Map(1L -> 3, 2L -> 1, 3L -> 1))
    // transitions are emitted exactly once per stage
    assert(got.groupBy(e => (e.user_id, e.stage)).forall(_._2.length == 1))
  }

  test("micro-batch boundaries do not change outcomes: one batch vs three") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Ev(7L, "view", ts(T0)), Ev(7L, "click", ts(T0 + 1000)),
      Ev(7L, "purchase", ts(T0 + 2000)),
      Ev(8L, "view", ts(T0)), Ev(8L, "purchase", ts(T0 + 1000)))
    val mem = MemoryStream[Ev]
    val q = FunnelStream.funnelStream(mem.toDS())
      .writeStream.format("memory").queryName("funnel_one").outputMode("append").start()
    mem.addData(evs: _*); q.processAllAvailable()
    val got = spark.sql("SELECT user_id, stage FROM funnel_one")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).max).toMap
    q.stop()
    assert(got == Map(7L -> 3, 8L -> 1))
    assert(got == Map(7L -> FunnelStream.serialStage(evs.filter(_.user_id == 7L)),
      8L -> FunnelStream.serialStage(evs.filter(_.user_id == 8L))))
  }

  test("view-less users leave NO state behind (bounded memory on bot traffic)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // click/purchase-only users across two batches: every invocation
    // folds to all-Unset, so zero state rows must survive either batch
    val mem = MemoryStream[Ev]
    val q = FunnelStream.funnelStream(mem.toDS())
      .writeStream.format("memory").queryName("funnel_botless").outputMode("append").start()
    mem.addData((1L to 50L).map(u => Ev(u, "click", ts(T0 + u))): _*)
    q.processAllAvailable()
    mem.addData((1L to 50L).map(u => Ev(u, "purchase", ts(T0 + 1000 + u))): _*)
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    q.stop()
    assert(stateRows == 0L, s"view-less users leaked $stateRows state rows")
    assert(spark.sql("SELECT * FROM funnel_botless").count() == 0L)
  }

  test("DECLARED divergence: in-lateness but cross-batch-reordered view folds in " +
    "arrival order (stream stage 1 vs serial 2); lateness=0 drops it instead") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // click arrives in batch 1, the view it would qualify arrives in
    // batch 2 with an EARLIER event time (within the 1h lateness).
    val evs1 = Seq(Ev(9L, "click", ts(T0 + 1000)))
    val evs2 = Seq(Ev(9L, "view", ts(T0)))
    val mem = MemoryStream[Ev]
    val q = FunnelStream.funnelStream(mem.toDS())
      .writeStream.format("memory").queryName("funnel_ooo").outputMode("append").start()
    mem.addData(evs1: _*); q.processAllAvailable()
    mem.addData(evs2: _*); q.processAllAvailable()
    val got = spark.sql("SELECT user_id, stage FROM funnel_ooo")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    q.stop()
    // serial recurrence (event order) would reach stage 2; the stream's
    // monotone fold cannot retroactively lower tv → stage 1 only
    assert(FunnelStream.serialStage(evs1 ++ evs2) == 2)
    assert(got == Set((9L, 1)))
  }

  test("the serial recurrence matches the batch operator's stage counts on the fixture") {
    import org.apache.spark.sql.functions._
    val byStage = graft.ops.Events.funnel(spark, Sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val evs = Tables.events(spark, Sf)
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect().map(r => Ev(r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val stages = evs.groupBy(_.user_id).view
      .mapValues(e => FunnelStream.serialStage(e.toSeq)).toMap
      .values.filter(_ > 0)
    val counts = stages.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(counts == byStage, s"stream recurrence $counts != batch $byStage")
  }
}
