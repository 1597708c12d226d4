package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.PolitenessStream
import graft.streaming.PolitenessStream.{Candidate, Scheduled}

class PolitenessStreamSpec extends SparkSuite {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val T0 = 1754006400000L // 2025-08-01T00:00:00Z

  test("per-host delay holds ACROSS micro-batches: the stream replays the serial fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      Candidate("a.com", "u1", ts(T0), 5000L),
      Candidate("a.com", "u2", ts(T0 + 1000), 5000L), // ready before a.com is free
      Candidate("b.com", "v1", ts(T0), 2000L))
    val batch2 = Seq(
      Candidate("a.com", "u3", ts(T0 + 7000), 5000L), // free at T0+10000 > ready
      Candidate("b.com", "v2", ts(T0 + 60000), 2000L)) // long idle: no constraint
    val mem = MemoryStream[Candidate]
    val q = PolitenessStream.scheduleStream(mem.toDS())
      .writeStream.format("memory").queryName("sched").outputMode("append").start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    val got = spark.sql("SELECT host, url, scheduled FROM sched").as[Scheduled]
      .collect().map(s => (s.host, s.url) -> s.scheduled.getTime).toMap
    q.stop()
    val expected = (PolitenessStream.serialFold(batch1.filter(_.host == "a.com") ++
        batch2.filter(_.host == "a.com")) ++
      PolitenessStream.serialFold(batch1.filter(_.host == "b.com") ++
        batch2.filter(_.host == "b.com")))
      .map(s => (s.host, s.url) -> s.scheduled.getTime).toMap
    assert(got == expected)
    // and the fold is the politeness semantics: u2 waits for u1's delay
    assert(got(("a.com", "u2")) == T0 + 5000)
    assert(got(("a.com", "u3")) == T0 + 10000, "carry-over ACROSS the batch boundary")
    assert(got(("b.com", "v2")) == T0 + 60000, "idle host imposes no wait")
  }

  test("within a micro-batch, candidates schedule in (ready, url) order — replays are bit-stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val shuffled = Seq(
      Candidate("c.com", "z", ts(T0 + 100), 1000L),
      Candidate("c.com", "a", ts(T0 + 100), 1000L), // same ready: url breaks the tie
      Candidate("c.com", "m", ts(T0), 1000L))
    val mem = MemoryStream[Candidate]
    val q = PolitenessStream.scheduleStream(mem.toDS())
      .writeStream.format("memory").queryName("sched2").outputMode("append").start()
    mem.addData(shuffled: _*)
    q.processAllAvailable()
    val got = spark.sql("SELECT url, scheduled FROM sched2")
      .collect().map(r => r.getString(0) -> r.getTimestamp(1).getTime).toMap
    q.stop()
    // m first at its ready instant; a waits for m's delay (T0+1000);
    // z then waits for a's delay (T0+2000) — the accumulated courtesy
    assert(got == Map("m" -> T0, "a" -> (T0 + 1000), "z" -> (T0 + 2000)))
  }

  test("event-time timeout evicts inert host state once the watermark passes nextFree") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Candidate]
    val q = PolitenessStream.scheduleStream(mem.toDS(), lateness = "0 seconds")
      .writeStream.format("memory").queryName("sched3").outputMode("append").start()
    mem.addData(Candidate("d.com", "w1", ts(T0), 5000L))
    q.processAllAvailable()
    // advance the watermark FAR past d.com's nextFree via another host,
    // then run an empty trigger so the timeout fires and removes state
    mem.addData(Candidate("e.com", "x1", ts(T0 + 3600L * 1000), 1000L))
    q.processAllAvailable()
    mem.addData(Candidate("d.com", "w2", ts(T0 + 3600L * 1000 + 10), 5000L))
    q.processAllAvailable()
    val got = spark.sql("SELECT url, scheduled FROM sched3")
      .collect().map(r => r.getString(0) -> r.getTimestamp(1).getTime).toMap
    q.stop()
    // w2 schedules at its own ready instant: the stale state (nextFree
    // T0+5000, long before the watermark) was evicted, and even if it
    // hadn't been, max(ready, nextFree) = ready — eviction is
    // semantically free, which is exactly why the timeout is safe
    assert(got(("w2")) == T0 + 3600L * 1000 + 10)
    assert(got(("x1")) == T0 + 3600L * 1000)
  }
}
