package graft

import org.apache.spark.sql.functions._
import graft.dedup.SetSim

class SetSimSpec extends SparkSuite {

  private def brute(docs: Seq[(Long, String)], tauBp: Int): Set[(Long, Long, Long, Long)] = {
    def set(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < SetSim.K) Set.empty
      else toks.sliding(SetSim.K).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> set(t) }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      i = (sa intersect sb).size.toLong
      u = (sa union sb).size.toLong
      if i > 0 && 10000 * i >= tauBp * u
    } yield (a, b, i, u)).toSet
  }

  private val corpus: Seq[(Long, String)] = {
    // three near-dup families + unrelated background + short docs
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    Seq(
      0L -> base,
      1L -> base.replace("mu", "nu"),                     // tail swap: high overlap
      2L -> base,                                         // identical copy
      3L -> ("prefix " + base),                           // one-token prepend
      4L -> "one two three four five six seven eight nine ten",
      5L -> "cats dogs birds fish mice",                  // unrelated
      6L -> "a b",                                        // < K tokens: absent
      7L -> "x y z",                                      // exactly K: one shingle
      8L -> "x y z",                                      // its identical twin
      9L -> "red green blue red green blue red green blue" // internal repeats
    )
  }

  test("prefix-filtered join equals brute force exactly (recall AND precision)") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = SetSim.similarityJoin(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == brute(corpus, SetSim.TauBp))
    // sanity on the plant: identical copies and the tail swap must be in
    assert(got.exists(p => p._1 == 0L && p._2 == 2L && p._3 == p._4))
    assert(got.exists(p => p._1 == 7L && p._2 == 8L && p._3 == 1L && p._4 == 1L))
  }

  test("threshold sweep stays exact at loose and tight tau") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    for (tau <- Seq(3000, 5000, 9500, 10000)) {
      val got = SetSim.similarityJoin(docs, tauBp = tau).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == brute(corpus, tau), s"mismatch at tau=$tau")
    }
  }

  test("jac_bp is the exact floored basis-point ratio") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    SetSim.similarityJoin(docs, tauBp = 3000).collect().foreach { r =>
      assert(r.getLong(4) == 10000 * r.getLong(2) / r.getLong(3))
    }
  }

  test("candidate volume is below all-pairs on the fixture corpus") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val sets = SetSim.shingleSets(docs)
    val nDocs = sets.select("doc_id").distinct().count()
    val cand = SetSim.candidates(sets).count()
    assert(cand < nDocs * (nDocs - 1) / 2,
      "prefix filter must prune below the quadratic pair space")
  }

  test("cross-source matrix counts unordered source pairs of exact tau-pairs") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (0L, base, "web"),
      (1L, base, "books"),            // web~books pair
      (2L, base, "web"),              // web~web pair with 0, web~books with 1
      (3L, "one two three four five six seven", "news") // no partner
    ).toDF("doc_id", "text", "source")
    val m = SetSim.crossSourceMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("books", "web") -> 2L, ("web", "web") -> 1L))
  }

  test("lsh recall audit: hits bounded by both sides, recall in basis points") {
    val r = graft.dedup.SetSim.lshRecall(spark, Sf).collect()(0)
    val (nEx, nLsh, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nEx > 0, "fixture plants true pairs")
    assert(nHit <= nEx && nHit <= nLsh)
    assert(r.getLong(3) == 10000 * nHit / nEx)
  }

  test("incremental keep: batch docs tau-similar to any index doc drop, others stay") {
    import spark.implicits._
    val kept = graft.dedup.SetSim.incrementalKeep(spark, Sf).collect()
      .map(_.getLong(0)).toSet
    assert(kept.nonEmpty)
    assert(kept.forall(_ % 10 == 0), "only batch docs can be kept")
    // exact cross-check against similarityJoin's full pair list: a batch
    // doc is dropped iff it pairs with an index doc at tau
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val pairs = graft.dedup.SetSim.similarityJoin(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val droppedExpected = pairs.flatMap { case (a, b) =>
      Seq(a -> b, b -> a)
    }.filter { case (x, y) => x % 10 == 0 && y % 10 != 0 }.map(_._1).toSet
    val allBatch = graft.dedup.SetSim.shingleSets(docs)
      .select("doc_id").distinct().collect().map(_.getLong(0))
      .filter(_ % 10 == 0).toSet
    assert(kept == allBatch -- droppedExpected)
  }

  test("singleton sets keep a full prefix (p = 1) so identical twins are found") {
    import spark.implicits._
    val docs = Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text")
    val p = SetSim.prefixes(SetSim.shingleSets(docs))
    assert(p.count() == 2L, "sz=1 prefix must keep the single shingle")
  }
}
