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
}
