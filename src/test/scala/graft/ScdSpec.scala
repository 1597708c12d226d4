package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Scd

class ScdSpec extends SparkSuite {

  private def ev(id: Long, user: Long, t: Long, attr: String) =
    (id, new Timestamp(t / 1000), user, attr, 0.0, "{}")

  private def frame(rows: Seq[(Long, Timestamp, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("consecutive equal attributes collapse; intervals chain exactly") {
    val us = 1000000L
    val df = frame(Seq(
      ev(1, 7, 10 * us, "view"), ev(2, 7, 20 * us, "view"),
      ev(3, 7, 30 * us, "click"), ev(4, 7, 40 * us, "view"),
      ev(5, 9, 10 * us, "buy")))
    val got = Scd.scd2(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      (7L, "view", 10 * us, 30 * us, 1L),
      (7L, "click", 30 * us, 40 * us, 2L),
      (7L, "view", 40 * us, -1L, 3L),
      (9L, "buy", 10 * us, -1L, 1L)))
  }

  test("same-microsecond ties order by event_id deterministically") {
    val us = 1000000L
    val df = frame(Seq(
      ev(2, 1, 10 * us, "b"), ev(1, 1, 10 * us, "a"), ev(3, 1, 20 * us, "b")))
    val got = Scd.scd2(df).orderBy("version").collect()
      .map(r => (r.getString(1), r.getLong(4)))
    assert(got.toSeq == Seq(("a", 1L), ("b", 2L)))
  }

  test("as-of midpoint returns exactly one covering row per active user") {
    val dim = Scd.asOfMidpoint(Tables.events(spark, Sf))
    assert(dim.count() > 0)
    assert(dim.groupBy("user_id").count().filter(col("count") > 1).count() == 0,
      "intervals are disjoint, so at most one covers the probe")
  }

  test("fixture intervals are well-formed: from < to, versions dense from 1") {
    val dim = Scd.scd2(Tables.events(spark, Sf)).persist()
    assert(dim.filter(col("valid_to").isNotNull &&
      col("valid_from") >= col("valid_to")).count() == 0)
    val byUser = dim.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max(col("version")).as("mx"),
        sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("open"))
    assert(byUser.filter(col("n") =!= col("mx") || col("open") =!= 1L).count() == 0,
      "versions dense 1..n and exactly one open interval per user")
    dim.unpersist()
  }
}
