package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventsStream

class DedupStreamSpec extends SparkSuite {

  case class Ev(event_id: Long, ts: java.sql.Timestamp, payload: String)
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("stream-static enrichment joins each batch against the broadcast dim, stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, String)]
    val q = EventsStream.enrichStream(
        mem.toDF().toDF("user_id", "action"), dim, "user_id")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    mem.addData((1L, "click"), (3L, "view")) // 3 has no dim row -> null tier
    q.processAllAvailable()
    val out = spark.sql("SELECT user_id, tier FROM enriched")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    q.stop()
    assert(out === Map(1L -> Some("gold"), 3L -> None))
  }

  test("foreachBatch merge sink lands last-writer-wins per key across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft-stream-merge").toString + "/t"
    val mem = MemoryStream[(String, String, String)]
    val q = EventsStream.streamMergeByKey(
        mem.toDF().toDF("id", "ver", "payload"), "id", "ver", path)
      .start()
    mem.addData(("k1", "2020-01-01", "v1"), ("k2", "2020-01-01", "w1"))
    q.processAllAvailable()
    mem.addData(("k1", "2020-06-01", "v2")) // newer version for k1
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(path)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out === Map("k1" -> "v2", "k2" -> "w1"))
  }

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
