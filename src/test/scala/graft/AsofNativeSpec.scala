package graft

import org.apache.spark.sql.functions._
import graft.ops.AsofJoin

class AsofNativeSpec extends SparkSuite {

  test("native node is bit-equal to the composed union+window form") {
    val a = AsofJoin.eventsAsofErrors(spark, Sf).orderBy("event_id").collect()
    val b = AsofJoin.eventsAsofErrorsNative(spark, Sf).orderBy("event_id").collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("plans as AsofJoinExec: no window, one exchange and one sort per side") {
    val plan = AsofJoin.eventsAsofErrorsNative(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), "custom physical node must appear")
    assert(!plan.contains("Window"), "no window machinery on the native path")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"one hash exchange per side, got $exchanges\n$plan")
    assert("\\bSort\\b".r.findAllIn(plan).length >= 2, "per-side (key, ts) sorts")
  }

  test("null keys and timestamps never match, on either side") {
    import spark.implicits._
    val left = Seq(
      (1L, Option(10L), Option(100L)), // normal
      (2L, Option(10L), None),         // null ts
      (3L, None, Option(100L)),        // null key
      (4L, Option(20L), Option(50L)))  // key with only-null right rows
      .toDF("id", "k", "t")
      .select(col("id"), col("k").as("key"), col("t").as("ts"))
    val right = Seq(
      (Option(10L), Option(90L), "a"),
      (Option(10L), None, "nullts"),
      (None, Option(1L), "nullkey"),
      (Option(20L), None, "only-null"))
      .toDF("k", "t", "v")
      .select(col("k").as("key"), col("t").as("ts"), col("v").as("payload"))
    val out = AsofJoin.asofJoinNative(left, right, "key", "ts")
      .orderBy("id").collect()
    assert(out(0).getAs[String]("payload") == "a")
    assert(out(1).isNullAt(out(1).fieldIndex("payload")))
    assert(out(2).isNullAt(out(2).fieldIndex("payload")))
    assert(out(3).isNullAt(out(3).fieldIndex("payload")))
  }

  test("equal timestamps match (at-or-before, not strictly-before)") {
    import spark.implicits._
    val left = Seq((1L, 5L, 100L)).toDF("id", "key", "ts")
    val right = Seq((5L, 100L, "same-instant")).toDF("key", "ts", "payload")
    val out = AsofJoin.asofJoinNative(left, right, "key", "ts").collect()
    assert(out(0).getAs[String]("payload") == "same-instant")
  }

  test("ties on (key, ts): payload is deterministic (maximal), not arrival order") {
    import spark.implicits._
    val left = Seq((1L, 5L, 100L)).toDF("id", "key", "ts")
    // duplicate (key, ts) with different payloads, deliberately scrambled
    // across many partitions — the required ordering's payload tiebreaker
    // must make the kept row the maximal payload regardless of layout
    val right = Seq(("b", 0), ("c", 3), ("a", 7), ("c", 1))
      .toDF("v", "shard")
      .repartition(8, col("shard"))
      .select(lit(5L).as("key"), lit(100L).as("ts"), col("v").as("payload"))
    (1 to 3).foreach { _ =>
      val out = AsofJoin.asofJoinNative(left, right, "key", "ts").collect()
      assert(out(0).getAs[String]("payload") == "c")
    }
  }

  test("row multiplicity: exactly one output row per left row") {
    val leftCount = graft.Tables.events(spark, Sf).count()
    assert(AsofJoin.eventsAsofErrorsNative(spark, Sf).count() == leftCount)
  }
}
