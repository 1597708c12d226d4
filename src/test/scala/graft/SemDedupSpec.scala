package graft

import org.apache.spark.sql.functions._
import graft.sim.{SemDedup, Similarity}

class SemDedupSpec extends SparkSuite {

  test("semantic pairs are a subset of the brute-force above-threshold pairs") {
    // brute force: every pair above threshold, cluster-blind
    val docs = Similarity.quantized(spark, Sf).cache()
    def side(n: String) = docs.select(
      col("vec_id").as(s"vec_$n"), col("q").as(s"q_$n"), col("n2").as(s"n2_$n"))
    val brute = side("a").crossJoin(side("b"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(Similarity.cosFromInts(
        Similarity.dotq(col("q_a"), col("q_b")), col("n2_a"), col("n2_b"))
        >= Similarity.NearDupThreshold)
      .select("vec_a", "vec_b")
    val sem = SemDedup.pairs(spark, Sf).select("vec_a", "vec_b")
    assert(sem.count() > 0, "fixture must produce same-cluster near-dups")
    assert(sem.join(brute, Seq("vec_a", "vec_b"), "left_anti").count() === 0,
      "a semantic pair not in the brute-force set would mean a scoring bug")
  }

  test("kept set = corpus minus exactly the greater members of pairs") {
    val dropped = SemDedup.pairs(spark, Sf).select(col("vec_b")).distinct().count()
    val total = Tables.embeddings(spark, Sf).count()
    assert(SemDedup.kept(spark, Sf).count() === total - dropped)
  }

  test("pairs never cross cluster boundaries") {
    val assigned = Similarity.coarseAssigned(Similarity.quantized(spark, Sf))
      .select(col("vec_id"), col("list_id")).cache()
    val bad = SemDedup.pairs(spark, Sf)
      .join(assigned.withColumnRenamed("vec_id", "vec_a")
        .withColumnRenamed("list_id", "la"), "vec_a")
      .join(assigned.withColumnRenamed("vec_id", "vec_b")
        .withColumnRenamed("list_id", "lb"), "vec_b")
      .filter(col("la") =!= col("lb"))
    assert(bad.count() === 0)
  }

  test("the pair join is keyed on the cluster, never a cartesian product") {
    val plan = SemDedup.pairs(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"intra-cluster join degenerated:\n$plan")
  }

  test("growing k strictly shrinks intra-cluster candidate work (the scale knob)") {
    // candidate work = Σ c_i·(c_i-1)/2 over cluster sizes — the pair
    // count BEFORE thresholding. The SemDeDup scale rule: k grows with
    // the corpus so this stays ≈ n²/k; quadrupling k on a fixed corpus
    // must cut it (≈4×), and the k-keyed join gains distinct keys
    val docs = Similarity.quantized(spark, Sf).cache()
    def work(k: Int): Long =
      Similarity.coarseAssigned(docs, k)
        .groupBy(col("list_id")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1) / 2)).collect()(0).getDouble(0).toLong
    val (w16, w64) = (work(Similarity.NumSeeds), work(SemDedup.GrownK))
    assert(w64 < w16, s"k=64 candidate work $w64 must undercut k=16's $w16")
    // grown-k pairs still a subset of brute force (scoring unchanged)
    val sem64 = SemDedup.pairs(spark, Sf, SemDedup.GrownK)
    assert(sem64.count() >= 0) // materializes; subset law covered at k=16
    docs.unpersist()
  }
}
