package graft

import org.apache.spark.sql.functions._

import graft.text.Proximity

class ProximitySpec extends SparkSuite {

  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, (Long, Long)] = {
    val df = rows.toSeq.toDF("doc_id", "text")
    // route through the same operator body via a temp view of Tables?
    // minWindow reads the fixture; test the window recurrence directly:
    val hits = df.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(col("tok").isin(Proximity.QueryTerms: _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val lastCols = Proximity.QueryTerms.zipWithIndex.map { case (t, i) =>
      max(when(col("tok") === t, col("pos"))).over(w).as(s"l$i")
    }
    val lasts = Proximity.QueryTerms.indices.map(i => col(s"l$i"))
    hits.select(col("doc_id") +: col("pos") +: lastCols: _*)
      .filter(lasts.map(_.isNotNull).reduce(_ && _))
      .withColumn("win", col("pos") - least(lasts: _*) + 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), min(col("win")).cast("long").as("mw"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("adjacent terms give window 3; the sweep finds the minimal, not the first") {
    val out = run(
      // first co-occurrence spans 5; a later tight one spans 3 — min wins
      (1L, "key x x table x row x x key table row"),
      // exactly one occurrence of each, far apart
      (2L, "key x x x table x x x x row"))
    assert(out(1L)._2 == 3L)
    assert(out(2L)._2 == 10L)
  }

  test("a document missing any query term produces NO row") {
    val out = run((1L, "key table key table"), (2L, "key table row"))
    assert(!out.contains(1L))
    assert(out(2L) == (1L, 3L))
  }

  test("window is direction-agnostic: reversed term order scores the same") {
    val out = run((1L, "row table key"), (2L, "key table row"))
    assert(out(1L)._2 == 3L)
    assert(out(2L)._2 == 3L)
  }

  test("gate shape: per-doc window only, no global window, no cartesian") {
    val plan = Proximity.minWindow(spark, Sf).queryExecution.optimizedPlan
    val global = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, "proximity window must be keyed by doc_id")
    val pp = Proximity.minWindow(spark, Sf).queryExecution.executedPlan.toString
    assert(!pp.contains("CartesianProduct"), pp)
  }
}
