package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.ScdStream
import graft.streaming.ScdStream.{Ev, VersionRow}

class ScdStreamSpec extends SparkSuite {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val T0 = 1754006400000L // 2025-08-01T00:00:00Z
  private val Min = 60L * 1000

  private val batch1 = Seq(
    Ev(1, 7, "view", ts(T0)),
    Ev(2, 7, "view", ts(T0 + Min)),      // same attr: no emission
    Ev(3, 9, "buy", ts(T0)))
  private val batch2 = Seq(
    Ev(4, 7, "click", ts(T0 + 2 * Min)), // closes view -> v1 emitted
    Ev(5, 9, "buy", ts(T0 + 3 * Min)))   // still buy: silent
  private val batch3 = Seq(
    Ev(6, 7, "view", ts(T0 + 4 * Min)),  // closes click -> v2 emitted
    Ev(7, 11, "ping", ts(T0 + 5 * Min)))

  private def runStream(batches: Seq[Seq[Ev]]): Seq[VersionRow] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = ScdStream.scdStream(mem.toDS())
      .writeStream.format("memory").queryName("scd").outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val got = spark.sql("SELECT * FROM scd").as[VersionRow].collect().toSeq
    q.stop()
    spark.sql("DROP TABLE IF EXISTS scd")
    got
  }

  private def batchClosed(all: Seq[Ev]): Set[(Long, String, Long, Long, Long)] = {
    import spark.implicits._
    val df = all.map(e => (e.event_id, e.ts, e.user_id, e.event_type, 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    graft.ops.Scd.scd2(df).filter(col("valid_to").isNotNull).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
  }

  test("closed versions across micro-batches equal the batch operator exactly") {
    val got = runStream(Seq(batch1, batch2, batch3))
      .filter(_.valid_to.isDefined)
      .map(v => (v.user_id, v.attr, v.valid_from, v.valid_to.get, v.version.toLong))
      .toSet
    assert(got == batchClosed(batch1 ++ batch2 ++ batch3))
    assert(got.nonEmpty)
  }

  test("batch-boundary placement does not change the closed rows") {
    val all = batch1 ++ batch2 ++ batch3
    val a = runStream(Seq(all)).filter(_.valid_to.isDefined).toSet
    val b = runStream(all.map(Seq(_))).filter(_.valid_to.isDefined).toSet
    assert(a == b)
  }

  test("idle entities retire: open version emitted with null valid_to, state evicted") {
    // push the watermark past T0 + TTL with a far-future sentinel user
    val far = ScdStream.IdleTtlUs / 1000L + 3600L * 1000 * 3
    val got = runStream(Seq(batch1, batch2, batch3,
      Seq(Ev(99, 999, "wake", ts(T0 + far)))))
    val opens = got.filter(v => v.valid_to.isEmpty && v.user_id != 999L)
      .map(v => (v.user_id, v.attr, v.version)).toSet
    // every fixture user's open version retires: 7 open on view v3,
    // 9 open on buy v1, 11 open on ping v1
    assert(opens == Set((7L, "view", 3), (9L, "buy", 1), (11L, "ping", 1)))
  }
}
