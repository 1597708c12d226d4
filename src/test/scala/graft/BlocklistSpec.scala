package graft

import org.apache.spark.sql.functions._
import graft.text.Blocklist

class BlocklistSpec extends SparkSuite {

  private def bruteCount(text: String, p: String): Int =
    (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length))

  test("hand-built cases: overlap, prefix-of-pattern outputs, misses") {
    import spark.implicits._
    val rows = Seq(
      "a a a scan slow fast",  // "a a"×2 (overlapping), scan, scan slow, fast
      "table table table",     // "table table"×2 overlapping
      "nothing here",
      "sparkspark")            // "spark"×2, no separator needed
      .toDF("text")
      .select(Blocklist.multiMatch(col("text"), Blocklist.Patterns).as("m"))
      .select("m.*").collect()
    // doc 0: a a(2) + scan(1) + scan slow(1) + fast(1) = 5 hits, 4 patterns
    assert(rows(0).getLong(0) == 5 && rows(0).getInt(1) == 4)
    // doc 1: table table at offsets 0 and 6 = 2 hits, 1 pattern
    assert(rows(1).getLong(0) == 2 && rows(1).getInt(1) == 1)
    assert(rows(2).getLong(0) == 0 && rows(2).getInt(1) == 0)
    assert(rows(3).getLong(0) == 2 && rows(3).getInt(1) == 1)
  }

  test("matches brute-force overlapping counts on the fixture") {
    val docs = graft.Tables.documents(spark, Sf)
      .select("doc_id", "text").limit(50).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    val got = Blocklist.blocklistHits(spark, Sf)
      .filter(col("doc_id").isin(docs.keys.toSeq: _*)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got.size == docs.size)
    docs.foreach { case (id, text) =>
      val perPat = Blocklist.Patterns.map(p => bruteCount(text, p))
      val expHits = perPat.map(_.toLong).sum
      val expPats = perPat.count(_ > 0)
      assert(got(id) == ((expHits, expPats)), s"doc $id")
    }
  }

  test("foldable pattern side builds the automaton once per scan, not per row") {
    val before = classOf[graft.plans.MultiMatch].getDeclaredMethods // touch class
    val counter = {
      val f = graft.plans.MultiMatch.getClass.getDeclaredField("autoBuilds")
      f.setAccessible(true)
      f.get(graft.plans.MultiMatch).asInstanceOf[java.util.concurrent.atomic.AtomicLong]
    }
    val start = counter.get()
    Blocklist.blocklistHits(spark, Sf).agg(sum("n_hits")).collect()
    val builds = counter.get() - start
    val rows = graft.Tables.documents(spark, Sf).count()
    assert(builds < rows / 2,
      s"automaton built $builds times for $rows rows — the hoist is broken")
    assert(before.nonEmpty)
  }

  test("a 10k-pattern blocklist matches brute force — the scale the design claims") {
    import spark.implicits._
    // deterministic 10k patterns over the fixture's vocabulary shape, plus
    // the original 10 (so known positives exist); many never occur
    val vocab = Seq("table", "scan", "fast", "slow", "key", "agg", "row",
      "value", "part", "hash", "merge", "batch", "window", "spark", "a", "the")
    val big = (0 until 10000).map { i =>
      val a = vocab(i % vocab.size); val b = vocab((i / vocab.size) % vocab.size)
      val c = vocab((i / (vocab.size * vocab.size)) % vocab.size)
      s"$a $b $c$i" // the trailing index makes most patterns absent
    } ++ Blocklist.Patterns
    val docs = graft.Tables.documents(spark, Sf)
      .select("doc_id", "text").limit(20).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    val got = graft.Tables.documents(spark, Sf)
      .filter(col("doc_id").isin(docs.keys.toSeq: _*))
      .select(col("doc_id"),
        Blocklist.multiMatch(coalesce(col("text"), lit("")), big).as("m"))
      .select(col("doc_id"), col("m.n_hits"), col("m.n_patterns")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    docs.foreach { case (id, text) =>
      val perPat = big.map(p => bruteCount(text, p))
      assert(got(id) == ((perPat.map(_.toLong).sum, perPat.count(_ > 0))), s"doc $id")
    }
  }

  test("plan is map-only: no key shuffle before the per-doc output") {
    val plan = Blocklist.blocklistHits(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"), "blocklist scan must not shuffle by key")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
  }

  // ---- the scrub half: leftmost-longest non-overlapping replacement ----

  /** Independent mirror of the FlashText contract: at each position
    * try every pattern by direct substring compare, keep the longest,
    * jump past it — no trie, no shared code with the expression.
    */
  private def mirrorScrub(text: String, pats: Seq[String], repl: String): (String, Long) = {
    val sb = new StringBuilder
    var n = 0L
    var i = 0
    while (i < text.length) {
      val best = pats.filter(p => p.nonEmpty && text.startsWith(p, i))
        .map(_.length).sorted.lastOption
      best match {
        case Some(len) => sb.append(repl); n += 1; i += len
        case None => sb.append(text.charAt(i)); i += 1
      }
    }
    (sb.toString, n)
  }

  test("scrub contract cases: longest wins, adjacency, non-overlap, miss") {
    def run(t: String) = {
      val r = graft.plans.MultiReplace.run(t,
        graft.plans.MultiMatch.build(
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
            Blocklist.Patterns.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)),
        "[X]")
      (r.getUTF8String(0).toString, r.getLong(1))
    }
    assert(run("x scan slow y") == (("x [X] y", 1L)), "longest must win over its prefix")
    assert(run("scan fast") == (("[X] [X]", 2L)), "adjacent matches both scrub")
    assert(run("a a a") == (("[X] a", 1L)), "occurrences never overlap")
    assert(run("nothing here") == (("nothing here", 0L)))
    assert(run("") == (("", 0L)))
    assert(run("scanscan slow") == (("[X][X]", 2L)),
      "a consumed prefix does not resurrect for the next position")
  }

  test("scrub equals the independent mirror over the whole real corpus") {
    val texts = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val auto = graft.plans.MultiMatch.build(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Blocklist.Patterns.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray))
    var changed = 0
    texts.foreach { case (id, t) =>
      val got = graft.plans.MultiReplace.run(t, auto, "[X]")
      val want = mirrorScrub(t, Blocklist.Patterns, "[X]")
      assert((got.getUTF8String(0).toString, got.getLong(1)) == want, s"doc $id")
      if (want._2 > 0) changed += 1
    }
    assert(changed > 0, "the fixture must actually contain blocklist phrases")
  }

  test("scrub gate plan stays map-only too") {
    val plan = Blocklist.blocklistScrub(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
  }
}
