package graft

import org.apache.spark.sql.functions._

import graft.pipelines.Hygiene
import graft.text.Bpe

class HygieneBpeSpec extends SparkSuite {

  test("hygiene funnel: chained invariants on the fixture corpus") {
    val rows = Hygiene.funnel(spark, Sf)
      .orderBy("stage_id")
      .select("stage_id", "stage", "n_in", "n_dropped", "n_out")
      .collect()
    assert(rows.length == 7)
    assert(rows.map(_.getString(1)).toSeq == Hygiene.Stages.map(_._2))
    val total = spark.read.parquet(s"$Sf/documents.parquet").count()
    // funnel enters with the whole corpus and every stage chains exactly
    assert(rows.head.getLong(2) == total)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) == b.getLong(2),
        s"n_out of ${a.getString(1)} must equal n_in of ${b.getString(1)}")
    }
    val kept = rows.last
    assert(kept.getLong(3) == 0 && kept.getLong(2) == kept.getLong(4))
    // thresholds are fixture-calibrated: the funnel must actually reject
    assert(rows.map(_.getLong(3)).sum > 0)
    assert(kept.getLong(4) > 0)
  }

  test("hygiene funnel vocab: sketch-union estimates track exact per-depth distinct terms") {
    import graft.text.TextOps
    val withVocab = Hygiene.funnelWithVocab(spark, Sf)
      .orderBy("stage_id")
      .select("stage_id", "n_in", "distinct_terms_in")
      .collect()
    assert(withVocab.length == 7)
    // exact per-depth distinct terms for comparison (test-only re-scan;
    // the operator itself merges the 7-row sketch table)
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val st = Hygiene.assignments(spark, Sf).select("doc_id", "stage_id")
    val terms = docs.join(st, "doc_id")
      .select(col("stage_id"), explode(TextOps.tokenize(col("text"))).as("term"))
      .persist()
    try withVocab.foreach { r =>
      val sid = r.getInt(0)
      val exact = terms.filter(col("stage_id") >= sid).select("term").distinct().count()
      val est = r.getLong(2).toDouble
      assert(math.abs(est - exact) <= exact * 0.05 + 1,
        s"stage $sid: estimate $est vs exact $exact") // HLL lgK default ≈ ±2.6%
    } finally terms.unpersist()
  }

  test("hygiene funnel: exact-dup stage drops copies, first doc wins") {
    import spark.implicits._
    // lang-marker-rich ('the' => en), 100 distinct tokens (full length
    // bonus, ~zero stopword/dup penalty) so stages 1-5 all pass;
    // docs 1 and 3 are identical => one must die at exact_dup
    val good = "the " + (1 to 99).map(i => f"word$i%02d").mkString(" ")
    val docs = Seq(
      (1L, good), (2L, good + " extra tail words here"), (3L, good)
    ).toDF("doc_id", "text")
    // reuse the funnel's per-doc logic indirectly: run the real funnel on a
    // temp dir with this corpus written as documents.parquet
    val dir = java.nio.file.Files.createTempDirectory("hygiene-spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Hygiene.funnel(spark, dir).orderBy("stage_id").collect()
    val byStage = rows.map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(byStage("exact_dup") == 1L) // doc 3 dies, doc 1 kept
    assert(rows.last.getLong(4) == 2L)
  }

  test("html extraction: comments, script/style blocks, tags, entities — in order") {
    import spark.implicits._
    val cases = Seq(
      "<p>hello <b>world</b></p>" -> "hello world",
      "<!-- <p>commented tag must not leak</p> -->ok" -> "ok",
      "<script>var x = '<p>not text</p>';</script>after" -> "after",
      "<style>p { color: red }</style>text" -> "text",
      "a &amp; b &lt;kept&gt;" -> "a & b <kept>",
      "  spaced   out  " -> "spaced out")
    val out = cases.map(_._1).toDF("html")
      .select(graft.text.Html.extractText(col("html"))).as[String].collect()
    out.zip(cases.map(_._2)).foreach { case (got, want) =>
      assert(got == want, s"got '$got', want '$want'")
    }
  }

  test("bpe pairs: weighted by word frequency, multiplicity preserved, deterministic order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe-spec").toString
    // "aa aa aa ab" -> vocab {aa:3, ab:1}; pairs: "a a"->3, "a b"->1
    Seq((1L, "aa aa aa ab")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Bpe.topPairs(spark, dir).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a a", 3L), ("a b", 1L)))
  }

  test("streaming ingest filter: stages 1-5 per micro-batch, stateless, schema preserved") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = Hygiene.filterStream(mem.toDF().toDF("doc_id", "text"))
    assert(out.columns.toSeq == Seq("doc_id", "text")) // verdict cols dropped
    val q = out.writeStream.format("memory").queryName("hyg_stream")
      .outputMode("append").start()
    val good = "the " + (1 to 99).map(i => f"word$i%02d").mkString(" ")
    mem.addData(
      (1L, good),                                        // survives
      (2L, "too short"),                                 // stage 2
      (3L, (1 to 40).map(i => s"zz$i").mkString(" ")))   // no markers -> stage 3
    q.processAllAvailable()
    q.stop()
    val ids = spark.sql("SELECT doc_id FROM hyg_stream").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }

  test("bpe encode: subwords reassemble each word; merges shrink the token count") {
    import org.apache.spark.sql.functions._
    val enc = graft.text.Bpe.encode(spark, Sf).cache()
    // round trip: dropping the separators reproduces the word exactly
    assert(enc.filter(regexp_replace(col("toks"), " ", "") =!= col("w")).count() === 0)
    // the merge table is non-trivial on the fixture: some words compress
    assert(enc.filter(col("n_tok") < length(col("w"))).count() > 0)
    // and encoding never exceeds character count
    assert(enc.filter(col("n_tok") > length(col("w"))).count() === 0)
  }

  test("bpe merge pass: one greedy scan reaches the merge's fixpoint") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def mergeOnce(pair: String)(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftColumnShim.column(
        graft.plans.PhraseMerge(
          org.apache.spark.sql.GraftColumnShim.expression(c),
          org.apache.spark.sql.GraftColumnShim.expression(array(lit(pair))),
          sep = ""))
    val cases = Seq(
      (Seq("a", "a", "a"), Seq("aa", "a")),       // leftmost-first, no re-merge
      (Seq("a", "a", "a", "a"), Seq("aa", "aa")),
      (Seq("t", "h", "e"), Seq("th", "e")),
      (Seq("x"), Seq("x")),
      (Seq.empty[String], Seq.empty[String]))
    val pair = Map(0 -> "a a", 1 -> "a a", 2 -> "t h", 3 -> "a a", 4 -> "a a")
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      val got = Seq(in).toDF("toks").select(mergeOnce(pair(i))(col("toks"))).head().getSeq[String](0)
      assert(got.toSeq === want, s"case $i")
      // fixpoint: applying the same merge again changes nothing
      val again = Seq(got.toSeq).toDF("toks").select(mergeOnce(pair(i))(col("toks"))).head().getSeq[String](0)
      assert(again.toSeq === want, s"case $i not at fixpoint after one scan")
    }
  }

  test("bpe merge-all: one constant-depth expression ≡ the nested per-rule form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def nested(c: org.apache.spark.sql.Column, merges: Seq[String]) =
      merges.foldLeft(c)((acc, p) =>
        org.apache.spark.sql.GraftColumnShim.column(
          graft.plans.PhraseMerge(
            org.apache.spark.sql.GraftColumnShim.expression(acc),
            org.apache.spark.sql.GraftColumnShim.expression(array(lit(p))),
            sep = "")))
    def all(c: org.apache.spark.sql.Column, merges: Seq[String]) =
      org.apache.spark.sql.GraftColumnShim.column(
        graft.plans.BpeMergeAll(
          org.apache.spark.sql.GraftColumnShim.expression(c), merges, sep = ""))
    // real fixture vocabulary × a real (small-m) prefix of the learned table
    val merges8 = graft.text.Bpe.mergeTable(spark, Sf).take(8)
    val vocab = Tables.documents(spark, Sf)
      .select(explode(graft.text.TextOps.tokenize(col("text"))).as("w"))
      .distinct()
    val diff = vocab.select(col("w"),
        nested(split(col("w"), ""), merges8).as("a"),
        all(split(col("w"), ""), merges8).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() === 0, "merge-all diverged from the nested per-rule form")
    // adversarial rank-order cases: later merges create EARLIER ranks'
    // pairs, which neither form may revisit
    val cases = Seq(
      // rank1 "a b" creates nothing; rank2 "ab c" only applies after rank1
      (Seq("a", "b", "c"), Seq("a b", "ab c"), Seq("abc")),
      // rank1 consumed left-to-right first; rank2 sees the merged stream
      (Seq("a", "a", "a"), Seq("a a", "aa a"), Seq("aaa")),
      // rank-1 "b a" fires mid-array; rank-2 "a b" then sees [a, ba, b]
      // where no "a b" pair remains — and may not revisit rank 1 either
      (Seq("a", "b", "a", "b"), Seq("b a", "a b"), Seq("a", "ba", "b")),
      (Seq.empty[String], Seq("a a"), Seq.empty[String]))
    cases.zipWithIndex.foreach { case ((in, merges, want), i) =>
      val gotAll = Seq(in).toDF("toks")
        .select(all(col("toks"), merges)).head().getSeq[String](0)
      val gotNested = Seq(in).toDF("toks")
        .select(nested(col("toks"), merges)).head().getSeq[String](0)
      assert(gotAll.toSeq === gotNested.toSeq, s"case $i: forms diverge")
      assert(gotAll.toSeq === want, s"case $i")
    }
    // the point of the rewrite: plan size constant in m — one merge-all
    // instance per consumer (size, concat_ws; identical, so codegen CSE
    // evaluates once), never one phrase_merge per rule
    val plan = graft.text.Bpe.encode(spark, Sf).queryExecution.analyzed.toString
    assert("bpe_merge_all".r.findAllIn(plan).size === 2)
    assert(!plan.contains("phrase_merge"))
  }

  test("bpe merge-all: per-row cost MEASURED flat from 64 to 50k rules") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.plans.BpeMergeAll
    // the applicable subset is IDENTICAL in both tables; the 50k table
    // adds never-occurring rules only — a released tokenizer's shape,
    // where almost no merge fires on any one row. If per-row cost
    // scaled with m (the nested form's failure mode), the big table
    // would be ~780× slower; the hash-probe design must keep it flat.
    val applicable = Seq("a b", "ab c", "abc d", "e f", "ef g", "h i")
    val small = BpeMergeAll.buildRanks(applicable ++ (0 until 58).map(i => s"x$i y$i"))
    val big = BpeMergeAll.buildRanks(applicable ++ (0 until 49994).map(i => s"x$i y$i"))
    val toks = Array.fill(8)(Seq("a", "b", "c", "d", "e", "f", "g", "h", "i"))
      .flatten.map(UTF8String.fromString(_): Any).toArray
    val row = new GenericArrayData(toks)
    val sep = UTF8String.fromString("")
    // identical output first: the pads must be pure no-ops
    val outSmall = BpeMergeAll.compute(row, small, sep)
    val outBig = BpeMergeAll.compute(row, big, sep)
    assert(outSmall.numElements() == outBig.numElements())
    (0 until outSmall.numElements()).foreach { i =>
      assert(outSmall.getUTF8String(i) == outBig.getUTF8String(i))
    }
    def perRowMs(ranks: java.util.HashMap[UTF8String, Integer]): Double = {
      (1 to 2000).foreach(_ => BpeMergeAll.compute(row, ranks, sep))
      val n = 20000
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => BpeMergeAll.compute(row, ranks, sep))
      (System.nanoTime() - t0) / 1e6 / n
    }
    val tSmall = (1 to 3).map(_ => perRowMs(small)).min
    val tBig = (1 to 3).map(_ => perRowMs(big)).min
    info(f"per-row: 64 rules ${tSmall * 1000}%.1f us, 50k rules ${tBig * 1000}%.1f us")
    // the failure mode being excluded is ~780x (cost scaling with m);
    // the bound is deliberately loose so CI load cannot flake it while
    // any real dependence on table size still fails by two orders
    assert(tBig < tSmall * 5.0,
      f"50k-rule per-row cost $tBig%.4f ms vs 64-rule $tSmall%.4f ms — not flat")
  }

  test("misra-gries: guaranteed superset of stream heavy hitters, bounded size") {
    import graft.text.HeavyHitters
    // adversarial stream: 1 dominant element amid k distinct spam tokens
    val k = 5
    val stream = (1 to 400).flatMap(i => Seq("heavy", s"spam${i % 37}"))
    val out = HeavyHitters.misraGries(stream.iterator, k).toSet
    assert(out.size <= k)
    assert(out.contains("heavy")) // freq 400/800 > n/k => must survive
  }

  test("heavy hitters: exact counts match a direct groupBy, threshold honored") {
    import org.apache.spark.sql.functions.{count => cnt}
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val words = docs.select(explode(graft.text.TextOps.tokenize(col("text"))).as("term"))
    val n = words.count()
    val direct = words.groupBy("term").agg(cnt(lit(1)).as("c"))
      .filter(col("c") * graft.text.HeavyHitters.K > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.text.HeavyHitters.heavyTerms(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == direct)
    assert(got.nonEmpty)
  }

  test("bpe pairs: fixture top pair count matches a direct corpus count") {
    // the vocab-first aggregation must equal naive per-document counting
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val tk = graft.text.TextOps.tokenize(col("text"))
    val naive = docs
      .select(explode(tk).as("w"))
      .select(explode(zip_with(
        slice(split(col("w"), ""), lit(1), greatest(size(split(col("w"), "")) - 1, lit(0))),
        slice(split(col("w"), ""), lit(2), greatest(size(split(col("w"), "")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
    val top = Bpe.topPairs(spark, Sf).collect()
    val naiveMap = naive.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    top.foreach { r =>
      assert(naiveMap(r.getString(0)) == r.getLong(1),
        s"pair ${r.getString(0)} disagrees with naive count")
    }
  }

  test("BPE decode round-trip: concatenating a word's tokens reproduces the word exactly") {
    // sep="" merges are lossless by construction — decode is the
    // separator-free concat, and the gate's toks column must replay the
    // vocabulary bit-for-bit (the tokenizer-serving contract)
    import org.apache.spark.sql.functions._
    val bad = graft.text.Bpe.encode(spark, Sf)
      .filter(regexp_replace(col("toks"), " ", "") =!= col("w"))
      .count()
    assert(bad == 0L, s"$bad vocabulary words fail the decode round-trip")
  }

  test("fertility: per-language bpe-tokens-per-word, exact join of corpus and vocab encode") {
    import org.apache.spark.sql.functions._
    val f = graft.text.Bpe.fertility(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(f.keySet == Set("en", "de", "es", "fr", "zh"))
    f.values.foreach { case (words, toks, bp) =>
      assert(words > 0 && toks >= words, "a word encodes to >= 1 token")
      assert(bp == 10000L * toks / words)
      assert(bp >= 10000L && bp < 100000L)
    }
    // the vocab-encode side must reach the corpus join as a BROADCAST
    val plan = graft.text.Bpe.fertility(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }
}
