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

  test("gated moment output is string + BIGINT only (no decimal, no float)") {
    // DECIMAL is banned from gated outputs outright (round-6 lesson: the
    // driver hasher canonicalizes decimal128 differently across engines
    // even for bit-exact values), so the gate folds each decimal(38,0)
    // moment mod 1e9+7 to LongType.
    import org.apache.spark.sql.types.{LongType, StringType}
    val bad = ops.Relational.qMomentStats(spark, Sf).schema.fields
      .filterNot(f => f.dataType == LongType || f.dataType == StringType)
    assert(bad.isEmpty, s"non-string/long gated columns: ${bad.mkString(",")}")
  }

  test("gated moments are the mod-1e9+7 fold of the exact decimal moments") {
    val M = BigInt(1000000007L)
    val cols = Seq("sx", "sy", "sxx", "syy", "sxy")
    val exact = ops.Relational.momentsExact(spark, Sf).collect()
      .map(r => r.getString(0) -> cols.map(c =>
        BigInt(r.getDecimal(r.fieldIndex(c)).toBigInteger) mod M)).toMap
    val gated = ops.Relational.qMomentStats(spark, Sf).collect()
      .map(r => r.getString(0) -> cols.map(c =>
        BigInt(r.getLong(r.fieldIndex(c))))).toMap
    assert(exact === gated)
    gated.values.flatten.foreach(v => assert(v >= 0 && v < M))
  }

  test("q18: one aggregate, top-k as TakeOrdered, every row clears the HAVING bound") {
    import org.apache.spark.sql.functions._
    val df = graft.ops.Relational.q18LargeOrders(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-100 must not global-sort:\n$plan")
    // exactly one corpus-wide aggregate: the lineitem quantity rollup
    assert("HashAggregate".r.findAllIn(plan).size <= 4, // partial+final, no re-aggregation pair
      s"Q18 re-aggregated after the join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) > graft.ops.Relational.Q18MinQty))
  }

  test("q4: the correlated EXISTS plans as one semi join with the non-equi condition") {
    val df = graft.ops.Relational.q4PriorityCheck(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS must decorrelate to a semi join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // every priority bucket is populated on the fixture
    assert(df.collect().length === 5)
  }

  test("q13: zero-order customers survive as the c_count = 0 group") {
    import org.apache.spark.sql.functions._
    val df = graft.ops.Relational.q13CustomerDistribution(spark, Sf)
    val zero = df.filter(col("c_count") === 0L).collect()
    assert(zero.length === 1, "the preserved-NULL group is Q13's point")
    // distribution masses sum to the customer count
    val total = df.agg(sum(col("custdist"))).collect()(0).getLong(0)
    assert(total === Tables.customer(spark, Sf).count())
  }

  test("full outer reconcile: one-sided groups are preserved, not dropped") {
    val rows = graft.ops.Relational.fullOuterReconcile(spark, Sf).collect()
    assert(rows.nonEmpty)
    val sides = rows.groupBy(_.getAs[String]("side")).view.mapValues(_.length).toMap
    assert(sides.keySet.exists(_ != "both"),
      s"fixture produced no one-sided nation — the FULL OUTER path is vacuous: $sides")
    // preservation: output keys = union of both filtered sides' keys
    import org.apache.spark.sql.functions.col
    val custKeys = Tables.customer(spark, Sf).filter(col("c_acctbal") > 7500)
      .select(col("c_nationkey")).distinct().collect().map(_.getAs[Number](0).longValue()).toSet
    val suppKeys = Tables.supplier(spark, Sf).filter(col("s_acctbal") > 0)
      .select(col("s_nationkey")).distinct().collect().map(_.getAs[Number](0).longValue()).toSet
    assert(rows.map(_.getAs[Number]("nationkey").longValue()).toSet == (custKeys ++ suppKeys))
    // zero-filled counts only ever appear on one-sided rows
    rows.filter(_.getAs[String]("side") == "both").foreach { r =>
      assert(r.getAs[Long]("n_big_customers") > 0 && r.getAs[Long]("n_big_suppliers") > 0)
    }
  }

  test("q21: dims broadcast, fact correlations stack semi+anti, no cartesian") {
    val df = graft.ops.Relational.q21WaitingSuppliers(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"Q21 needs both rewrites on the same fact:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"dims must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(df.collect().nonEmpty)
  }
}
