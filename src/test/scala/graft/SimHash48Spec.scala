package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup.SimHash
import graft.plans.SimHash48

class SimHash48Spec extends SparkSuite {

  test("single-token signature IS the first 12 md5 hex chars (known value)") {
    // md5("hello") = 5d41402abc4b2a76b9719d911017c592 -> first 6 bytes
    import spark.implicits._
    val sig = Seq(Seq("hello")).toDF("toks")
      .select(org.apache.spark.sql.GraftColumnShim.column(
        SimHash48(org.apache.spark.sql.GraftColumnShim.expression(col("toks")))).as("sh"))
      .head().getLong(0)
    assert(sig === java.lang.Long.parseLong("5d41402abc4b", 16))
  }

  test("SQL-registered simhash48 equals the Column form") {
    val docs = Tables.documents(spark, Sf).limit(50)
    docs.createOrReplaceTempView("sh48_docs")
    val a = docs.select(col("doc_id"),
      SimHash.simhash48Of(array_distinct(graft.text.TextOps.tokenize(col("text")))).as("sh"))
    val b = spark.sql(
      "SELECT doc_id, simhash48(array_distinct(" +
        "filter(split(trim(text), '\\\\s+'), t -> length(t) > 0))) AS sh FROM sh48_docs")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("banded join achieves guaranteed recall at Hamming <= NumBands-1, vs brute force") {
    val sigs = Tables.documents(spark, Sf)
      .select(col("doc_id"), SimHash.simhash48(col("text")).as("sh"))
      .cache()
    val brute = sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        SimHash.hamming(col("x.sh"), col("y.sh")).cast("long").as("hamming"))
      .filter(col("hamming") <= SimHash48.NumBands - 1)
    val banded = graft.dedup.Dedup.SimHash.nearDupPairs48(spark, Sf)
      .filter(col("hamming") <= SimHash48.NumBands - 1)
    assert(brute.exceptAll(banded).isEmpty,
      "every pair within the pigeonhole bound must be found by the banded join")
    assert(banded.exceptAll(brute).isEmpty, "banded join must not invent pairs")
  }

  test("candidate stage is bucket-joined, never all-pairs") {
    val plan = graft.dedup.Dedup.SimHash.nearDupPairs48(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"banded self-join must be an equi-join on (band, bv):\n$plan")
  }
}
