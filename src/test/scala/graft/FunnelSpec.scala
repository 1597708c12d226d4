package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Events

class FunnelSpec extends SparkSuite {

  import spark.implicits._

  private def funnelOf(rows: (Long, String, String)*): Map[Int, Long] = {
    val e = rows.toSeq
      .map { case (u, t, ts) => (u, t, Timestamp.valueOf(ts)) }
      .toDF("user_id", "event_type", "ts")
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
    val tv = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("tv"))
    val tc = e.filter(col("event_type") === "click").join(tv, Seq("user_id"))
      .filter(col("us") > col("tv") && col("us") <= col("tv") + Events.FunnelHorizonUs)
      .groupBy(col("user_id")).agg(min(col("us")).as("tc"))
    val tp = e.filter(col("event_type") === "purchase").join(tc, Seq("user_id"))
      .filter(col("us") > col("tc") && col("us") <= col("tc") + Events.FunnelHorizonUs)
      .groupBy(col("user_id")).agg(min(col("us")).as("tp"))
    tv.join(tc.select(col("user_id"), lit(1).as("c2")), Seq("user_id"), "left")
      .join(tp.select(col("user_id"), lit(1).as("c3")), Seq("user_id"), "left")
      .select((lit(1) + coalesce(col("c2"), lit(0)) + coalesce(col("c3"), lit(0))).as("stage"))
      .groupBy(col("stage")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  test("order matters: a click BEFORE the first view does not convert") {
    val out = funnelOf(
      (1L, "click", "2024-01-01 09:00:00"), (1L, "view", "2024-01-01 10:00:00"),
      (2L, "view", "2024-01-01 09:00:00"), (2L, "click", "2024-01-01 10:00:00"))
    assert(out == Map(1 -> 1L, 2 -> 1L))
  }

  test("the horizon bounds each hop: a click 25h after the view is out") {
    val out = funnelOf(
      (1L, "view", "2024-01-01 00:00:00"), (1L, "click", "2024-01-02 01:00:00"),
      (2L, "view", "2024-01-01 00:00:00"), (2L, "click", "2024-01-01 23:59:59"),
      (2L, "purchase", "2024-01-02 12:00:00"))
    assert(out == Map(1 -> 1L, 3 -> 1L))
  }

  test("stage 3 requires the full ordered chain through the FIRST qualifying click") {
    // the purchase precedes the first qualifying click -> stage 2 only
    val out = funnelOf(
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "purchase", "2024-01-01 01:00:00"),
      (1L, "click", "2024-01-01 02:00:00"))
    assert(out == Map(2 -> 1L))
  }

  test("retention: every (cohort, offset) cell counts distinct users once") {
    val m = Events.cohortRetention(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val users = Tables.events(spark, Sf).select(col("user_id")).distinct().count()
    // offset-0 cells partition the user base: summing them equals |users|
    val offset0 = m.collect { case ((_, 0L), n) => n }.sum
    assert(offset0 == users, s"offset-0 sum $offset0 != $users")
    // no cell can exceed its cohort's own size
    m.foreach { case ((c, o), n) =>
      assert(n <= m((c, 0L)), s"cell ($c,$o)=$n exceeds cohort size ${m((c, 0L))}")
    }
  }
}
