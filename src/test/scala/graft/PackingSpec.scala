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

  test("overflow splits: per-doc parts sum to n_tokens; interior sequences exactly full") {
    val parts = Packing.packOverflow(spark, Sf).persist()
    try {
      val perDoc = parts.groupBy("doc_id").agg(sum("n_tokens_in_seq").as("s"))
        .join(Packing.packSequences(spark, Sf).select(col("doc_id"), col("n_tokens")), "doc_id")
      assert(perDoc.filter(col("s") =!= col("n_tokens")).count() === 0)
      assert(parts.filter(col("n_tokens_in_seq") <= 0).count() === 0)
      val perSeq = parts.groupBy("seq_id").agg(sum("n_tokens_in_seq").as("s"))
      val lastSeq = perSeq.agg(max("seq_id")).collect()(0).getLong(0)
      assert(perSeq.filter(col("seq_id") < lastSeq)
        .filter(col("s") =!= Packing.Budget).count() === 0,
        "every interior sequence must hold exactly Budget tokens")
      // docs really do cross boundaries on the fixture (10-99-token docs,
      // 256-token budget) — the refinement must not degenerate to 1 part/doc
      assert(parts.groupBy("doc_id").count().filter(col("count") > 1).count() > 0)
    } finally parts.unpersist()
  }

  test("packOn is partition-count independent: same result at 1, 3, and 17 partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val docs = (1L to 997L).map(i => (i, 1L + rnd.nextInt(120).toLong))
      .toDF("doc_id", "n_tokens")
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    def run(parts: String): Seq[(Long, Long, Long)] =
      try {
        conf.set("spark.sql.shuffle.partitions", parts)
        graft.ops.Packing.packOn(docs, Seq("doc_id"))
          .orderBy("doc_id").collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_before"),
            r.getAs[Long]("seq_id"))).toSeq
      } finally conf.set("spark.sql.shuffle.partitions", orig)
    val at1 = run("1")
    assert(run("3") == at1 && run("17") == at1)
    // and equal to the naive serial cumsum
    val tok = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var cum = 0L
    val naive = (1L to 997L).map { i =>
      val row = (i, cum, cum / graft.ops.Packing.Budget)
      cum += tok(i)
      row
    }
    assert(at1 == naive)
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
