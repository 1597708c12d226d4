package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Packing

class PackingSpec extends SparkSuite {

  test("two-pass prefix sum equals the naive global window exactly") {
    val got = Packing.packSequences(spark, Sf)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val naive = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"),
        size(graft.text.TextOps.tokenize(col("text"))).cast("long").as("n"))
      .withColumn("cum", coalesce(sum(col("n")).over(
        Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(2) / Packing.Budget))
    assert(got.toSeq == naive.toSeq)
  }

  test("packing invariants: cumulative order, contiguous non-decreasing sequences") {
    val rows = Packing.packSequences(spark, Sf).orderBy("doc_id").collect()
    var cum = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == cum, s"cum_before mismatch at doc ${r.getLong(0)}")
      assert(r.getLong(3) == cum / Packing.Budget)
      cum += r.getLong(1)
    }
    val seqIds = rows.map(_.getLong(3))
    assert(seqIds.sliding(2).forall { case Array(a, b) => a <= b })
    assert(seqIds.distinct.length > 1) // fixture actually spans sequences
  }
}
