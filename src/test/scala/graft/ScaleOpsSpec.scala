package graft

import org.apache.spark.sql.functions._
import graft.ops.ScaleOps

class ScaleOpsSpec extends SparkSuite {

  test("widen repartitions an under-split source and is the identity on a wide one") {
    val docs = Tables.documents(spark, Sf) // single-row-group fixture -> 1 split
    val slots = spark.sparkContext.defaultParallelism
    assert(ScaleOps.widen(docs).rdd.getNumPartitions === slots)
    val alreadyWide = docs.repartition(slots + 2)
    assert(ScaleOps.widen(alreadyWide).queryExecution.logical
      .eq(alreadyWide.queryExecution.logical),
      "a source at or above cluster parallelism must pass through untouched")
  }

  test("salted join returns exactly the rows of the plain join (inner)") {
    val o = Tables.orders(spark, Sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, Sf).select("c_custkey", "c_name")
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "c_name")
    val salted = ScaleOps.saltedJoin(o, c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", 8)
      .select("o_orderkey", "c_name")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salted join preserves left-outer semantics for unmatched big rows") {
    import spark.implicits._
    val big = Seq((1L, "a"), (2L, "b"), (99L, "orphan")).toDF("k", "v")
    val small = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    val out = ScaleOps.saltedJoin(big, small, "k", 4, "left_outer")
      .collect().map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(out === Set((1L, "a", "x"), (2L, "b", "y"), (99L, "orphan", null)))
  }

  test("salted join spreads a hot key over multiple salt partitions") {
    import spark.implicits._
    val big = Seq.fill(1000)((42L, "hot")).toDF("k", "v") // one key, 1000 rows
    val small = Seq((42L, "dim")).toDF("k", "w")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8L)))
    val saltsUsed = salted.select("__salt").distinct().count()
    assert(saltsUsed > 4, s"hot key should spread over most of 8 salts, used $saltsUsed")
    assert(ScaleOps.saltedJoin(big, small, "k", 8).count() === 1000)
  }

  test("MEASURED: salting bounds the max task shuffle-read under a hot key") {
    // one key floods 100k rows; unsalted, the whole key lands in ONE
    // task's shuffle read — salted over 64, each task carries a few
    // (key, salt) slivers of it (several slivers can co-hash into one of
    // the 32 partitions, so the bound is ~n/salts × collision factor).
    // This is the task-metrics fact behind the salting claim, not a
    // plan-shape proxy.
    val (unsalted, salted) = ScaleOps.skewProof(spark, hotRows = 100000L, salts = 64)
    assert(unsalted >= 100000L,
      s"unsalted max task must swallow the whole hot key, read $unsalted")
    assert(salted * 3 < unsalted,
      s"salted max task ($salted) must be well under unsalted ($unsalted)")
  }

  test("bucketed tables co-locate the join: sort-merge with no shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '$wh'")
    try {
      Tables.orders(spark, Sf).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("bdemo.orders_b")
      Tables.lineitem(spark, Sf).select("l_orderkey", "l_quantity").write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("bdemo.lineitem_b")
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      try {
        val joined = spark.table("bdemo.lineitem_b")
          .join(spark.table("bdemo.orders_b"), col("l_orderkey") === col("o_orderkey"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"))
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join must not shuffle either side:\n$plan")
        assert(joined.count() > 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bdemo.lineitem_b")
      spark.sql("DROP TABLE IF EXISTS bdemo.orders_b")
      spark.sql("DROP DATABASE IF EXISTS bdemo")
    }
  }
}
