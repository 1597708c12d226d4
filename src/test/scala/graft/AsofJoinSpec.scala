package graft

import org.apache.spark.sql.functions._
import graft.ops.AsofJoin

class AsofJoinSpec extends SparkSuite {

  test("as-of semantics on a hand-built frame: latest right at-or-before each left ts") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, "u", ts("2024-01-01 10:00:00")),
      (2L, "u", ts("2024-01-01 11:00:00")),
      (3L, "u", ts("2024-01-01 09:00:00")), // before any right row
      (4L, "v", ts("2024-01-01 10:30:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u", ts("2024-01-01 10:00:00"), 100L), // equal ts -> matches event 1
      ("u", ts("2024-01-01 10:30:00"), 101L),
      ("v", ts("2024-01-01 10:31:00"), 200L)  // after v's event -> no match
    ).toDF("user_id", "ts", "payload")
    val out = AsofJoin.asofJoin(left, right, "user_id", "ts")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out === Map(1L -> 100L, 2L -> 101L, 3L -> -1L, 4L -> -1L))
  }

  test("fixture query: error events match themselves; matches never in the future") {
    val out = AsofJoin.eventsAsofErrors(spark, Sf).cache()
    val ev = Tables.events(spark, Sf).select("event_id", "event_type")
    val errSelf = out.join(ev, "event_id").filter(col("event_type") === "error")
    assert(errSelf.filter(col("prev_err_id") =!= col("event_id")).count() === 0,
      "an error event's as-of match is itself")
    val withTs = out.join(Tables.events(spark, Sf).select("event_id", "ts"), "event_id")
    assert(withTs.filter(col("prev_err_ts") > col("ts")).count() === 0,
      "as-of never matches a future row")
  }

  test("colliding payload column names are rejected, not silently nulled") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, "u", ts("2024-01-01 10:00:00")))
      .toDF("payload", "user_id", "ts") // left already owns "payload"
    val right = Seq(("u", ts("2024-01-01 09:00:00"), 100L))
      .toDF("user_id", "ts", "payload")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right, "user_id", "ts")
    }
    assert(e.getMessage.contains("payload"))
  }

  test("collision guard is case-insensitive, matching withColumn resolution") {
    // withColumn resolves case-insensitively under the default
    // spark.sql.caseSensitive=false — "PAYLOAD" would replace "payload"
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, "u", ts("2024-01-01 10:00:00")))
      .toDF("payload", "user_id", "ts")
    val right = Seq(("u", ts("2024-01-01 09:00:00"), 100L))
      .toDF("user_id", "ts", "PAYLOAD")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right, "user_id", "ts")
    }
  }

  test("tolerance: stale matches nullify, fresh ones survive, match itself unchanged") {
    val plain = AsofJoin.eventsAsofErrors(spark, Sf)
      .select("event_id", "prev_err_ts").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val tol = AsofJoin.eventsAsofErrorsTolerant(spark, Sf)
      .select("event_id", "prev_err_ts").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(plain.keySet === tol.keySet)
    // tolerance only ever REMOVES a match, never changes or invents one
    tol.foreach { case (id, v) =>
      assert(v.isEmpty || v === plain(id), s"event $id: tolerant match differs")
    }
    val kept = tol.values.count(_.nonEmpty)
    val had = plain.values.count(_.nonEmpty)
    assert(kept > 0 && kept < had, s"tolerance must both keep ($kept) and drop (of $had)")
  }

  test("plan shape: one hash exchange by key, no range explosion join") {
    val plan = AsofJoin.eventsAsofErrors(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not degrade to a product join:\n$plan")
    assert(plan.contains("Window"), "the union+window composition is the expected shape")
  }
}
