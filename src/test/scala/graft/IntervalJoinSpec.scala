package graft

import org.apache.spark.sql.functions._

import graft.ops.IntervalJoin

class IntervalJoinSpec extends SparkSuite {

  test("chunk replication is bounded: every interval lands in at most 2 chunks") {
    val copies = IntervalJoin.intervals(spark, Sf)
      .withColumn("n", expr(s"(e - 1) DIV ${IntervalJoin.ChunkSec} - s DIV ${IntervalJoin.ChunkSec} + 1"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(copies <= 2, s"replication bound broken: $copies chunks")
    // precondition of the rewrite: no interval longer than the chunk
    val maxLen = IntervalJoin.intervals(spark, Sf)
      .agg(max(col("e") - col("s"))).collect()(0).getLong(0)
    assert(maxLen <= IntervalJoin.ChunkSec)
  }

  test("the bucketed join needs no dedup: (event, interval) pairs are unique") {
    val out = IntervalJoin.joined(spark, Sf)
    assert(out.count() == out.select(col("event_id"), col("ivl")).distinct().count())
    assert(out.count() > 0, "fixture must produce matches")
  }

  test("equals the direct containment join on the fixture") {
    val ivl = IntervalJoin.intervals(spark, Sf)
      .withColumnRenamed("user_id", "iu").withColumnRenamed("e", "iend")
    val direct = Tables.events(spark, Sf)
      .select(col("event_id"), col("user_id"), expr("unix_timestamp(ts)").as("t"))
      .join(ivl, col("user_id") === col("iu")
        && col("t") >= col("s") && col("t") < col("iend"))
      .select(col("event_id"), col("ivl").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = IntervalJoin.joined(spark, Sf)
      .select(col("event_id"), col("ivl")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == direct)
  }

  test("plan shape: hash join on (user, chunk) — no cartesian, no nested loop") {
    val plan = IntervalJoin.joined(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
