package graft

import org.apache.spark.sql.functions._

/** The double correlation lives OUTSIDE the hash gate (see
  * `Relational.qMomentStats` — round(DOUBLE) half-way behavior is not
  * contractually identical across engines), so this spec is where it is
  * pinned: derived from the gated exact moments, it must agree with
  * Spark's native streaming `corr` to float tolerance, and be exactly
  * reproducible run-to-run (plain scalar arithmetic over exact integers).
  */
class RelationalSpec extends SparkSuite {

  test("moment-derived correlation matches native corr to 1e-9") {
    val got = ops.Relational.qMomentCorr(spark, Sf)
      .select(col("l_returnflag"), col("corr_qty_price"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val native = Tables.lineitem(spark, Sf)
      .groupBy(col("l_returnflag"))
      .agg(corr(floor(col("l_quantity") * 100), floor(col("l_extendedprice") * 100))
        .as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === native.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - native(k)) < 1e-9, s"flag $k: $v vs ${native(k)}")
      assert(math.abs(v) <= 1.0)
    }
  }

  test("moment-derived correlation is bit-stable across runs and partitionings") {
    val a = ops.Relational.qMomentCorr(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getDouble(7)).toMap
    val b = ops.Relational.qMomentCorr(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getDouble(7)).toMap
    assert(a === b) // exact-integer moments → one scalar expression: no ulp drift
  }

  test("gated moment output carries only exact integer/decimal columns") {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val floats = ops.Relational.qMomentStats(spark, Sf).schema.fields
      .filter(f => f.dataType == DoubleType || f.dataType == FloatType)
    assert(floats.isEmpty)
  }
}
