package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

import graft.ops.Quantiles

/** Histogram-selection quantiles: order-statistic equivalence against a
  * literal sort-and-index oracle, and the histogram-sized plan shape the
  * scaladoc claims.
  */
class QuantilesSpec extends SparkSuite {

  /** Type-1 (lower) quantile by literally sorting each group's values and
    * indexing at rank ⌈p·n/100⌉ — the definition, as a driver-side check.
    */
  private def naive(rows: Seq[(String, Long)], p: Int): Map[String, Long] =
    rows.groupBy(_._1).map { case (k, kv) =>
      val sorted = kv.map(_._2).sorted
      val rank = (p.toLong * sorted.size + 99) / 100 // ⌈p·n/100⌉, min 1
      k -> sorted((rank max 1).toInt - 1)
    }

  test("grouped quantiles equal the sort-and-index definition on lineitem") {
    val got = Quantiles.lineitemQuantiles(spark, Sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val rows = Tables.lineitem(spark, Sf)
      .select(col("l_returnflag"), floor(col("l_quantity")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.nonEmpty)
    Quantiles.Percents.foreach { p =>
      val expect = naive(rows, p)
      got.foreach { case (k, r) =>
        assert(r.getAs[Long](s"p$p") == expect(k), s"p$p mismatch for group $k")
      }
    }
    got.foreach { case (k, r) =>
      assert(r.getAs[Long]("n_rows") == rows.count(_._1 == k).toLong)
    }
  }

  test("duplicate-heavy and singleton groups select correctly") {
    import spark.implicits._
    // group a: 1,1,1,1,9 — p25..p75 land inside the duplicate run;
    // group b: one row — every percentile is that row
    val df = Seq(("a", 1L), ("a", 1L), ("a", 1L), ("a", 1L), ("a", 9L), ("b", 5L))
      .toDF("k", "v")
    val out = Quantiles.grouped(df, col("k"), col("v")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("p25") == 1L)
    assert(out("a").getAs[Long]("p75") == 1L)
    assert(out("a").getAs[Long]("p99") == 9L)
    Quantiles.Percents.foreach(p => assert(out("b").getAs[Long](s"p$p") == 5L))
  }

  test("plan is histogram-sized: two hash exchanges, no range shuffle, no row sort") {
    val p = Quantiles.lineitemQuantiles(spark, Sf)
      .queryExecution.explainString(SimpleMode)
    assert(!p.contains("Exchange rangepartitioning"),
      s"quantiles must never global-sort rows:\n$p")
    val hashes = p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashes <= 2, s"expected ≤2 hash exchanges (histogram, window):\n$p")
  }

  test("robust stats: median/MAD by hand on a micro set; spikes flag, bulk never does") {
    import spark.implicits._
    // group 0: values 1..9 plus a 10000 spike. median of 10 values
    // (type-1 lower) = 5; |v-5| = {4,3,2,1,0,1,2,3,4,9995} -> sorted
    // {0,1,1,2,2,3,3,4,4,9995}, lower median = 2; threshold 6 -> only
    // the spike (9995 > 6) flags
    val rows = ((1 to 9).map(v => (0L, v.toLong)) :+ ((0L, 10000L))).toDF("k", "v")
    val got = graft.ops.Quantiles.robustStats(rows, col("k"), col("v")).collect()(0)
    assert(got.getAs[Long]("n_rows") == 10L)
    assert(got.getAs[Long]("median_v") == 5L)
    assert(got.getAs[Long]("mad") == 2L)
    assert(got.getAs[Long]("outliers") == 1L)
  }

  test("robust stats fixture: every 97th doc spikes; the spike count matches the plant") {
    val rows = graft.ops.Quantiles.robustFixture(spark, Sf).collect()
      .map(r => r.getAs[Long]("k") -> ((r.getAs[Long]("n_rows"), r.getAs[Long]("outliers")))).toMap
    val ids = Tables.documents(spark, Sf).select("doc_id").collect().map(_.getLong(0))
    val expected = ids.groupBy(_ % 3).view
      .mapValues(g => (g.size.toLong, g.count(id => id % 97 == 0 && id > 0).toLong)).toMap
    assert(rows.keySet == expected.keySet)
    // doc 0 spikes to 0*1000 = 0 which is NOT an outlier; all other %97
    // docs land 3 orders of magnitude out and must flag
    expected.foreach { case (k, (n, spikes)) =>
      assert(rows(k)._1 == n, s"group $k size")
      assert(rows(k)._2 == spikes, s"group $k outliers")
    }
  }

  test("robust stats plan: both medians run histogram selection; scalars broadcast back") {
    val plan = graft.ops.Quantiles.robustFixture(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
