package graft

import org.apache.spark.sql.functions._
import graft.sim.Similarity

class DotProductLongSpec extends SparkSuite {

  test("native expression equals the HOF form on dense equal-length arrays") {
    import spark.implicits._
    val df = Seq.tabulate(500)(i => (Seq.tabulate(64)(j => (i + j).toLong),
        Seq.tabulate(64)(j => (i - j).toLong)))
      .toDF("a", "b")
    val diff = df.select(
        Similarity.dotq(col("a"), col("b")).as("native"),
        Similarity.dotqHof(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() === 0)
  }

  test("null array yields null; empty arrays yield 0") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (Some(Seq.empty[Long]), Some(Seq.empty[Long]))
    ).toDF("a", "b").select(Similarity.dotq(col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getLong(0) === 0L)
  }

  test("SQL surface via SparkSessionExtensions: dot_long resolves and computes") {
    import spark.implicits._
    Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b").createOrReplaceTempView("dots")
    val r = spark.sql("SELECT dot_long(a, b) AS d FROM dots").collect()
    assert(r(0).getLong(0) === 32L)
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    // must read a real source — literal frames constant-fold to LocalTableScan
    val q = graft.Tables.embeddings(spark, Sf)
      .select(Similarity.qvec(col("embedding")).as("q"))
      .select(Similarity.dotq(col("q"), col("q")).as("d"))
    // compact plan marks codegen stages with a '*(n)' prefix; the dot_long
    // projection must carry one (the HOF qvec projection won't — that's
    // exactly why the native expression exists)
    val plan = q.queryExecution.executedPlan.toString
    val dotLine = plan.split("\n").find(_.contains("dot_long")).getOrElse("")
    assert(dotLine.trim.startsWith("*("), s"dot_long must sit in a codegen stage:\n$plan")
    assert(q.agg(min(col("d"))).collect()(0).getLong(0) > 0L, "norms are positive")
  }

  test("top-k results are identical whichever dot implementation scores them") {
    val native = Similarity.topK(spark, Sf).collect().toSet
    // temporarily rebuild the brute-force query with the HOF dot
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("label"), Similarity.qvec(col("embedding")).as("q"))
      .withColumn("n2", Similarity.dotqHof(col("q"), col("q")))
    val qs = docs.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos_sim"), asc("neighbor_id"))
    val hof = docs.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosFromInts(Similarity.dotqHof(col("q"), col("qq")), col("n2"), col("qn2")).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= Similarity.K)
      .select("query_id", "neighbor_id", "rank", "cos_sim")
      .collect().toSet
    assert(native === hof)
  }
}
