package graft

import org.apache.spark.sql.functions._
import graft.ops.CorpusOps

class CorpusOpsSpec extends SparkSuite {

  test("split is deterministic, content-independent, and roughly stratified") {
    val docs = Tables.documents(spark, Sf)
    val a = CorpusOps.stratifiedSplit(docs).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = CorpusOps.stratifiedSplit(docs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a === b, "same key -> same split under any partitioning")
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size).toMap
    assert(frac("train") > 0.6 && frac("train") < 0.95, s"train fraction off: $frac")
    assert(frac.keySet === Set("train", "val", "test"))
  }

  test("split plan is a pure projection: zero exchanges") {
    val plan = CorpusOps.stratifiedSplit(Tables.documents(spark, Sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split must not shuffle:\n$plan")
  }

  test("tf-idf top terms: k per doc, ranks dense from 1, common terms never outrank rare ones at equal tf") {
    val out = CorpusOps.tfidfTopTerms(spark, Sf).cache()
    val perDoc = out.groupBy("doc_id").agg(
      count(lit(1)).as("k"), max("rank").as("maxr"), min("rank").as("minr"))
    assert(perDoc.filter(col("k") > CorpusOps.TopK).count() === 0)
    assert(perDoc.filter(col("minr") =!= 1).count() === 0)
    assert(perDoc.filter(col("maxr") =!= col("k")).count() === 0, "ranks are 1..k dense")
    // within one document, at equal tf a larger df must never rank strictly better
    val self = out.as("p").join(out.as("q"),
        col("p.doc_id") === col("q.doc_id") && col("p.tf") === col("q.tf") &&
          col("p.df") < col("q.df") && col("p.rank") > col("q.rank"))
    assert(self.count() === 0, "rarer term (smaller df) must rank at least as high at equal tf")
  }

  test("pipeline report reads the corpus once: anti-join broadcast, one grouping exchange") {
    val plan = CorpusOps.pipelineReport(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"pair side of the dedup anti-join must broadcast:\n$plan")
    // exchanges: one keyed on `split` (the 3-group report) plus at most
    // the pair-table's own tiny distinct feeding its broadcast — nothing
    // else may shuffle corpus rows
    val exchanges = "Exchange hashpartitioning\\(([a-z_]+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq.sorted
    assert(exchanges == Seq("split") || exchanges == Seq("doc_id", "split"),
      s"unexpected exchange set ${exchanges.mkString(",")}:\n$plan")
  }

  test("approx_count_distinct (HLL) lands within 5% of the exact vocabulary") {
    val toks = Tables.documents(spark, Sf)
      .select(explode(graft.text.TextOps.tokenize(col("text"))).as("term"))
    val exact = toks.agg(countDistinct(col("term"))).head().getLong(0)
    val approx = toks.agg(approx_count_distinct(col("term"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"HLL estimate $approx too far from exact $exact")
  }

  test("tf-idf df join carries no static broadcast hint (AQE decides by size)") {
    // The vocabulary is NOT broadcast-sized at real corpus scale (10⁸–10⁹
    // terms at 100 TB), so the plan must not pin a broadcast: no
    // ResolvedHint/broadcast on the df side of the term join. At fixture
    // size AQE is free to (and does) pick broadcast from runtime stats —
    // assert only that the choice is left to it.
    val df = CorpusOps.tfidfTopTerms(spark, Sf)
    val hinted = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    // the one-row corpus-count N is the only legitimate hint
    assert(hinted.forall(_.child.output.map(_.name) == Seq("n")),
      s"unexpected broadcast hint beyond the one-row N: $hinted")
    df.count() // still executes green without the hint
  }

  test("capPerSource equals the global per-source hash rank and never exceeds the cap") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // skewed sources: src_a 40 docs, src_b 7, src_c 1
    val docs = ((1 to 40).map(i => (i.toLong, "src_a")) ++
      (41 to 47).map(i => (i.toLong, "src_b")) ++ Seq((48L, "src_c")))
      .toDF("doc_id", "source")
    val cap = 10
    val got = CorpusOps.capPerSource(docs, cap)
    val counts = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("src_a") == cap)
    assert(counts("src_b") == 7)
    assert(counts("src_c") == 1)
    // equivalence with the one-window spec the oracle states
    val h = md5(concat(col("doc_id").cast("string"), lit(CorpusOps.CapSalt)))
    val spec = docs.withColumn("h", h)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))))
      .filter(col("rn") <= cap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet == spec)
    // determinism
    assert(got.collect().map(_.getLong(0)).sorted.toSeq ==
      CorpusOps.capPerSource(docs, cap).collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("unigramSurprisal: rare tokens score msb(total)-msb(cnt), averaged per doc") {
    import spark.implicits._
    // corpus: 'the' x7, 'rare' x1 => total 8 tokens
    // msb(8)=4; surprisal(the)=4-3=1 (cnt 7 -> msb 3); surprisal(rare)=4-1=3
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    Seq((1L, "the the the the rare"), (2L, "the the the"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.unigramSurprisal(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((5L, 4L * 1 + 3, 1.4)))   // 4 tokens of s=1, one of s=3
    assert(out(2L) == ((3L, 3L, 1.0)))
  }

  test("bigramSurprisal: context scores, singleton pruning forces real backoff") {
    import spark.implicits._
    // corpus: doc1 "a b a b", doc2 "a a" => total 6; uni a=4, b=2
    // bigrams: (a,b)=2 kept; (b,a)=1, (a,a)=1 pruned (MinBigramCount=2)
    // msb: total 6->3, a->3, b->2, pcnt(a,b)=2->2
    // doc1: first a: 3-3=0; b|a kept: msb(a)-msb(2)=3-2=1;
    //       a|b pruned: 2+3-3=2; b|a kept: 1  => sum 4, backoff 1
    // doc2: first a: 0; a|a pruned: 2+3-3=2   => sum 2, backoff 1
    val dir = java.nio.file.Files.createTempDirectory("graft-lm2").toString
    Seq((1L, "a b a b"), (2L, "a a"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.bigramSurprisal(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((4L, 1L, 4L, 1.0)))
    assert(out(2L) == ((2L, 1L, 2L, 1.0)))
    // fixture: backoff fires somewhere, and context never scores negative
    val fx = CorpusOps.bigramSurprisal(spark, Sf)
    assert(fx.filter(col("n_backoff") > 0).count() > 0)
    assert(fx.filter(col("surprisal_sum") < 0).count() === 0)
  }

  test("vocab sketches: batch union estimates equal the one-shot sketch, near exact counts") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val merged = CorpusOps.vocabSketchMerged(CorpusOps.vocabSketchPerBatch(docs))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // one-shot sketch over the whole corpus (no batching) — union of the
    // per-batch sketches must estimate identically (mergeability)
    val oneShot = docs
      .select(col("lang"), explode(graft.text.TextOps.tokenize(col("text"))).as("term"))
      .groupBy(col("lang"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("term"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == oneShot, "batch-unioned sketches must match the one-shot sketch")
    // and land within 5% of the exact distinct counts
    val exact = docs
      .select(col("lang"), explode(graft.text.TextOps.tokenize(col("text"))).as("term"))
      .groupBy(col("lang")).agg(countDistinct(col("term")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (lang, d) =>
      val est = merged(lang).toDouble
      assert(math.abs(est - d) / d <= 0.05, s"$lang: est $est vs exact $d")
    }
  }

  test("mixCorpus: epochs materialize rate div 100 copies plus a deterministic fraction") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val out = CorpusOps.mixCorpus(docs)
    val perSource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    CorpusOps.MixRates.toMap.foreach { case (src, r) =>
      val n = base(src)
      val lo = n * (r / 100); val hi = lo + n // fractional part adds at most n
      assert(perSource(src) >= lo && perSource(src) <= hi,
        s"$src: ${perSource(src)} outside [$lo,$hi] for rate $r")
    }
    // unnamed sources run at exactly 100%
    val unnamed = base.keySet -- CorpusOps.MixRates.map(_._1).toSet
    unnamed.foreach(s => assert(perSource(s) == base(s)))
    // epochs are 1..n_copies, dense per doc
    val bad = out.groupBy("doc_id").agg(
        org.apache.spark.sql.functions.max("epoch").as("mx"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("c"),
        org.apache.spark.sql.functions.max("n_copies").as("nc"))
      .filter(org.apache.spark.sql.functions.expr("mx != c OR c != nc")).count()
    assert(bad == 0L)
    // determinism: a second evaluation is row-identical
    assert(out.except(CorpusOps.mixCorpus(docs)).count() == 0L)
  }
}
