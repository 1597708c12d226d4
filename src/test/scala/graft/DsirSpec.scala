package graft

import org.apache.spark.sql.functions._

import graft.text.Dsir

/** DSIR importance weighting: the selection property it exists for
  * (target-looking text up-weighted), deterministic scoring, one-pass
  * feature reuse, and per-language selection behavior.
  */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  test("target-language docs average a higher weight than the rest") {
    val w = Dsir.importanceWeights(spark, Sf).persist()
    val avg = w.groupBy(col("lang") === Dsir.TargetLang)
      .agg((sum("weight_bits") / count(lit(1))).as("mean"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg(true) > avg(false),
      s"English docs must up-weight under the English target: $avg")
    w.unpersist()
  }

  test("a raw doc written in the target vocabulary outranks one that is not") {
    // target = 'en' docs; doc 10 (lang xx) copies the target vocabulary,
    // doc 11 (lang xx) shares nothing with it
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en"),
      (2L, "alpha beta epsilon zeta", "en"),
      (3L, "beta gamma alpha zeta", "en"),
      (10L, "alpha beta gamma zeta", "xx"),
      (11L, "uno dos tres cuatro", "xx")
    ).toDF("doc_id", "text", "lang")
    val w = Dsir.importanceWeightsOf(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("weight_bits")).toMap
    assert(w(10L) > w(11L), s"target-vocab doc must score higher: $w")
  }

  test("scoring is deterministic and covers every non-empty doc") {
    val a = Dsir.importanceWeights(spark, Sf).orderBy("doc_id").collect().toSeq
    val b = Dsir.importanceWeights(spark, Sf).orderBy("doc_id").collect().toSeq
    assert(a == b)
    val nonEmpty = Tables.documents(spark, Sf)
      .filter(size(graft.text.TextOps.tokenize(col("text"))) > 0).count()
    assert(a.size.toLong == nonEmpty)
  }

  test("feature subtree is computed once across model/total/scoring branches") {
    val df = Dsir.importanceWeights(spark, Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"feature pass recomputed per branch:\n$p")
  }

  test("stream twin: frozen-model per-row score equals the batch gate per doc") {
    val (model, dflt) = Dsir.collectModel(spark, Sf)
    assert(model.nonEmpty && model.size <= Dsir.Buckets)
    val docs = Tables.documents(spark, Sf)
    val batch = Dsir.importanceWeights(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_feats"), r.getAs[Long]("weight_bits"))))
      .toMap
    val stream = Dsir.scoreStream(docs, model, dflt).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_feats"), r.getAs[Long]("weight_bits"))))
      .toMap
    assert(stream.keySet == batch.keySet)
    batch.foreach { case (d, v) =>
      assert(stream(d) == v, s"doc $d: stream ${stream(d)} != batch $v")
    }
    // and the per-row path is genuinely stateless: no exchange anywhere
    val p = Dsir.scoreStream(docs, model, dflt)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("Exchange"), s"stream scorer must be shuffle-free:\n$p")
  }

  test("per-language p75 selection keeps each language's own top slice") {
    val sel = Dsir.selectTop(spark, Sf).persist()
    val w = Dsir.importanceWeights(spark, Sf).persist()
    val perLangAll = w.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perLangSel = sel.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLangAll.foreach { case (lang, n) =>
      val kept = perLangSel.getOrElse(lang, 0L)
      assert(kept > 0, s"$lang lost every doc")
      // p75 threshold keeps at least a quarter (ties can push higher,
      // never lower), and must actually select, not pass everything
      assert(kept * 4 >= n, s"$lang kept $kept of $n — below the p75 floor")
      assert(kept < n, s"$lang kept everything — threshold did not bite")
    }
    assert(sel.filter(col("weight_bits") < col("threshold")).count() == 0)
    sel.unpersist(); w.unpersist()
  }
}
