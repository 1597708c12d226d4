package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

import graft.text.Retrieval

/** Inverted index + BM25: index invariants, the ranking properties BM25
  * exists to have (tf saturation, length normalization), determinism, and
  * the query-time plan shape (corpus never re-shuffles for a query).
  */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("postings invariants: tf sums to doc length, df counts posting rows") {
    val docs = Tables.documents(spark, Sf)
    val post = Retrieval.postingsOf(docs).persist()
    val dl = post.groupBy("doc_id").agg(sum("tf").as("dl"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = docs.select(col("doc_id"),
        size(Retrieval.terms(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs with ≥1 kept term appear with exactly their kept-token count
    direct.filter(_._2 > 0).foreach { case (d, n) =>
      assert(dl(d) == n, s"doc $d: postings tf sum ${dl.get(d)} != token count $n")
    }
    assert(dl.keySet.subsetOf(direct.filter(_._2 > 0).keySet))

    val stats = Retrieval.termStatsOf(docs)
    val dfFromPost = post.groupBy("term").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    stats.collect().foreach { r =>
      assert(r.getAs[Long]("df") == dfFromPost(r.getAs[String]("term")))
      assert(r.getAs[Long]("idf_bits") >= 0L)
    }
    post.unpersist()
  }

  test("bm25: repeated tf scores higher but saturates sublinearly") {
    // query terms (top-3 cf: common=5, alpha=4, beta=4) live in docs 1-4
    // only, so df=4 of N=8 keeps idf_bits = msb(8)-msb(4) = 1 — nonzero;
    // docs 5-8 are filler raising N without touching the query terms.
    val docs = corpus(
      (1L, "rare common alpha beta"),
      (2L, "common alpha beta gamma"),
      (3L, "common common alpha beta"),
      (4L, "common alpha beta delta"),
      (5L, "f5 g5"), (6L, "f6 g6"), (7L, "f7 g7"), (8L, "f8 g8"))
    val scores = Retrieval.bm25TopKOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_m")).toMap
    // doc 3 repeats 'common' (tf=2) at the same length as doc 2 (tf=1):
    // strictly higher, but by LESS than 2x (tf saturation)
    assert(scores(3L) > scores(2L), scores.toString)
    assert(scores(3L) < 2L * scores(2L), scores.toString)
  }

  test("bm25: same tf, longer doc scores lower (length normalization)") {
    // query = {alpha, beta, topic} (cf=4 each), df=2 of N=4 → idf_bits=1
    val docs = corpus(
      (1L, "topic topic alpha alpha beta beta"),
      (2L, "topic topic alpha alpha beta beta p1 p2 p3 p4 p5 p6"),
      (3L, "z1 z2"),
      (4L, "z3 z4"))
    val out = Retrieval.bm25TopKOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_m")).toMap
    assert(out(1L) > out(2L), s"short doc must outrank long at equal tf: $out")
  }

  test("bm25 gate is deterministic and fully ordered") {
    val a = Retrieval.bm25TopK(spark, Sf).collect()
    val b = Retrieval.bm25TopK(spark, Sf).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length <= Retrieval.TopK && a.nonEmpty)
    val scores = a.map(_.getAs[Long]("score_m")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("query plan: model sides broadcast, top-k is TakeOrdered not global sort") {
    val p = Retrieval.bm25TopK(spark, Sf).queryExecution.explainString(SimpleMode)
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"query-term/avgdl sides must broadcast:\n$p")
  }

  test("bm25 plan tokenizes the corpus once: postings exchange reused across branches") {
    // dl, term stats, and the scoring join all derive from ONE postings
    // subtree — at 100 TB the tokenize+count shuffle must not run three
    // times. Reuse is an AQE runtime decision: inspect the executed plan.
    val df = Retrieval.bm25TopK(spark, Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"), s"postings recomputed per branch:\n$p")
  }

  test("snippets: best window maximizes distinct query terms, leftmost on ties") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // craft a corpus whose 3 most frequent non-stopword terms are known
    // and one top doc has its densest window away from position 0
    val q = "qalpha qbeta qgamma"
    val docs = (
      Seq((1L, s"filler01 filler02 filler03 filler04 filler05 $q qalpha filler06 filler07 filler08")) ++
      (2L to 20L).map(i => (i, s"$q pad${i}a pad${i}b pad${i}c pad${i}d pad${i}e pad${i}f pad${i}g"))
    ).toDF("doc_id", "text")
    val snip = graft.text.Retrieval.snippets(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getString(3))).toMap
    assert(snip.nonEmpty)
    // doc 1: the only window with all 3 query terms starts at token 4
    // (0-based) — "filler05 qalpha qbeta qgamma qalpha ..." has them all
    val (h1, s1, t1) = snip(1L)
    assert(h1 == 3, s"got $h1")
    assert(t1.contains("qalpha") && t1.contains("qbeta") && t1.contains("qgamma"))
    // all-at-front docs: leftmost tie wins -> start 0
    assert(snip.collect { case (id, (_, s, _)) if id != 1L => s }.forall(_ == 0L))
  }

  test("rm3 expansion terms exclude the original query terms") {
    val docs = Tables.documents(spark, Sf)
    val q = Retrieval.termStatsOf(docs)
      .orderBy(org.apache.spark.sql.functions.desc("cf"),
        org.apache.spark.sql.functions.asc("term"))
      .limit(Retrieval.NumQueryTerms)
      .collect().map(_.getString(0)).toSet
    val exp = Retrieval.rm3TermsOf(docs).collect().map(_.getString(0)).toSet
    assert(exp.size == Retrieval.ExpTerms)
    assert(exp.intersect(q).isEmpty)
  }

  test("rm3 rerank is well-formed and reachable by expansion-only docs") {
    val docs = Tables.documents(spark, Sf)
    val df = Retrieval.rm3TopKOf(docs)
    val rows = df.collect()
    // the postings subtree feeds many branches; AQE must reuse, not
    // recompute, the tokenize+count exchange (the bm25 discipline)
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"))
    assert(rows.length == Retrieval.TopK)
    // scores strictly ordered by (score desc, doc_id asc)
    val scores = rows.map(r => (r.getLong(2), r.getLong(0)))
    assert(scores.sameElements(scores.sortBy(s => (-s._1, s._2))))
    // weighting means a doc can match more terms than the 3 originals
    assert(rows.exists(_.getLong(1) > Retrieval.NumQueryTerms.toLong))
  }
}
