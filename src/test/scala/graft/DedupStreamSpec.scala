package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventsStream

class DedupStreamSpec extends SparkSuite {

  case class Ev(event_id: Long, ts: java.sql.Timestamp, payload: String)
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming dedup drops re-deliveries of a key within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventsStream.dedupStream(mem.toDF(), "event_id")
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    mem.addData(
      Ev(1L, ts("2024-01-01 10:00:00"), "first"),
      Ev(1L, ts("2024-01-01 10:00:00"), "dup-same-batch"),
      Ev(2L, ts("2024-01-01 10:01:00"), "other"))
    q.processAllAvailable()
    mem.addData(Ev(1L, ts("2024-01-01 10:30:00"), "dup-later-batch")) // still inside horizon
    q.processAllAvailable()
    mem.addData(Ev(3L, ts("2024-01-01 15:00:00"), "advance watermark"))
    q.processAllAvailable()
    val out = spark.sql("SELECT event_id, payload FROM dedup_stream")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    q.stop()
    assert(out.count(_._1 == 1L) === 1, s"key 1 must survive exactly once, got ${out.toSeq}")
    assert(out.find(_._1 == 1L).get._2 === "first", "the FIRST delivery wins")
    assert(out.count(_._1 == 2L) === 1)
  }
}
