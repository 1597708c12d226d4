package graft

import org.apache.spark.sql.functions._

import graft.dedup.ExactSpans

/** The by-construction exactness claims of the shingle-anchored exact
  * span scrub, pinned at the edges where they could silently break.
  */
class ExactSpansSpec extends SparkSuite {

  import spark.implicits._

  private def toks(prefix: String, n: Int, salt: String = ""): String =
    (0 until n).map(i => s"$prefix$salt$i").mkString(" ")

  test("a shared span of exactly k tokens is removed; k-1 survives untouched") {
    val k = 10
    val shared10 = toks("s", 10)
    val shared9 = toks("t", 9)
    val df = Seq(
      (1L, s"${toks("a", 5)} $shared10 ${toks("b", 5)} $shared9 ${toks("c", 5)}"),
      (2L, s"${toks("d", 5)} $shared10 ${toks("e", 5)} $shared9 ${toks("f", 5)}")
    ).toDF("doc_id", "text")
    val out = ExactSpans.scrub(df, k).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (s"${toks("a", 5)} ${toks("b", 5)} $shared9 ${toks("c", 5)}", 10L, 1L))
    assert(out(2L) == (s"${toks("d", 5)} ${toks("e", 5)} $shared9 ${toks("f", 5)}", 10L, 1L))
  }

  test("within-document repetition: every occurrence removed, two islands") {
    val k = 10
    val s = toks("s", 12)
    val doc = s"${toks("a", 5)} $s ${toks("b", 5)} $s ${toks("c", 5)}"
    val out = ExactSpans.scrub(Seq((1L, doc)).toDF("doc_id", "text"), k).collect()(0)
    assert(out.getString(1) == s"${toks("a", 5)} ${toks("b", 5)} ${toks("c", 5)}")
    assert(out.getLong(2) == 24L)
    assert(out.getLong(3) == 2L)
  }

  test("identity on a corpus with no duplicated >=k span") {
    val k = 10
    val df = Seq(
      (1L, toks("a", 30)), (2L, toks("b", 30)), (3L, toks("c", 5))
    ).toDF("doc_id", "text")
    val out = ExactSpans.scrub(df, k).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (toks("a", 30), 0L, 0L))
    assert(out(2L) == (toks("b", 30), 0L, 0L))
    assert(out(3L) == (toks("c", 5), 0L, 0L), "shorter-than-k docs pass through")
  }

  test("overlapping duplicated windows merge into ONE maximal span") {
    val k = 10
    // 30 shared tokens -> 21 duplicated window starts, all overlapping
    val s = toks("s", 30)
    val df = Seq((1L, s"${toks("a", 4)} $s ${toks("b", 4)}"),
      (2L, s"${toks("c", 4)} $s ${toks("d", 4)}")).toDF("doc_id", "text")
    val out = ExactSpans.scrub(df, k).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (30L, 1L))
    assert(out(2L) == (30L, 1L))
  }

  test("recall closes the X164 gap: planted spans removed completely on the fixture") {
    val out = ExactSpans.planted(spark, Sf)
      .agg(min(col("removed_tokens")).as("mn"), max(col("removed_tokens")).as("mx"),
        max(col("n_spans")).as("sp"))
      .collect()(0)
    assert(out.getLong(0) == 75L, "every planted 75-token span fully removed (recall 1)")
    assert(out.getLong(1) == 75L, "nothing beyond the span removed (precision 1)")
    assert(out.getLong(2) == 1L)
  }

  test("shingle_md5 equals the builtin HOF composition (incl. empties and short docs)") {
    val df = Seq(
      (1L, toks("a", 30)),
      (2L, ""), // one empty token
      (3L, "x  y z"), // consecutive spaces -> empty middle token
      (4L, toks("a", 9)), // exactly k-1
      (5L, toks("a", 10)) // exactly k
    ).toDF("doc_id", "text")
    val fast = ExactSpans.shingleStarts(df, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val slow = ExactSpans.shingleStartsBuiltin(df, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    assert(fast.nonEmpty)
    assert(fast.toSeq == slow.toSeq)
  }

  test("scrubWs identity: a span-free corpus round-trips BYTE-exactly, whitespace kept") {
    val k = 10
    val df = Seq(
      (1L, "  leading \t tabs\nand\n\nnewlines " + toks("a", 12) + "  "),
      (2L, toks("b", 30).replace(" ", "\t")),
      (3L, ""), (4L, " \n\t ")
    ).toDF("doc_id", "text")
    val out = ExactSpans.scrubWs(df, k).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    df.collect().foreach { r =>
      assert(out(r.getLong(0)) == (r.getString(1), 0L),
        s"doc ${r.getLong(0)} must round-trip byte-exactly")
    }
  }

  test("scrubWs: occurrences with DIFFERENT internal whitespace still match; " +
    "splice removes token-to-token bytes only, framing whitespace survives") {
    val k = 10
    val sharedToks = (0 until 12).map(i => s"s$i")
    val span1 = sharedToks.mkString("\t") // tabs inside
    val span2 = sharedToks.mkString(" ") // single spaces inside
    val df = Seq(
      (1L, s"${toks("a", 5)} \n$span1\n  ${toks("b", 5)}"),
      (2L, s"${toks("c", 5)}  $span2 ${toks("d", 5)}")
    ).toDF("doc_id", "text")
    val out = ExactSpans.scrubWs(df, k).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // byte splice = [start of s0, end of s11): the ' \n' before and
    // '\n  ' after doc 1's span survive verbatim
    assert(out(1L) == (s"${toks("a", 5)} \n\n  ${toks("b", 5)}", 12L, 1L))
    assert(out(2L) == (s"${toks("c", 5)}   ${toks("d", 5)}", 12L, 1L))
  }

  test("scrubWs splice is byte-offset-safe on multi-byte content (emoji, CJK)") {
    val k = 10
    val span = toks("s", 12)
    val df = Seq(
      (1L, s"☃a 你好😀 c0 c1 c2 $span 🎉end"),
      (2L, s"d0 d1 d2 d3 d4 $span e0é e1")
    ).toDF("doc_id", "text")
    val out = ExactSpans.scrubWs(df, k).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (s"☃a 你好😀 c0 c1 c2  🎉end", 12L))
    assert(out(2L) == (s"d0 d1 d2 d3 d4  e0é e1", 12L))
  }

  test("scrubWs: k-1 messy-whitespace span untouched; exactly-k removed") {
    val k = 10
    val shared10 = (0 until 10).map(i => s"s$i").mkString("\n")
    val shared9 = (0 until 9).map(i => s"t$i").mkString("\t")
    val df = Seq(
      (1L, s"${toks("a", 3)} $shared10 ${toks("m", 5)} $shared9 ${toks("b", 3)}"),
      (2L, s"${toks("c", 3)} $shared10 ${toks("n", 5)} $shared9 ${toks("d", 3)}")
    ).toDF("doc_id", "text")
    val out = ExactSpans.scrubWs(df, k).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (s"${toks("a", 3)}  ${toks("m", 5)} $shared9 ${toks("b", 3)}", 10L, 1L))
    assert(out(2L) == (s"${toks("c", 3)}  ${toks("n", 5)} $shared9 ${toks("d", 3)}", 10L, 1L))
  }

  test("plantedWs fixture: 75/75 span tokens removed on every doc, framing ws survives") {
    val out = ExactSpans.plantedWsScrub(spark, Sf)
    val agg = out.agg(min(col("removed_tokens")), max(col("removed_tokens")),
      max(col("n_spans"))).collect()(0)
    assert(agg.getLong(0) == 75L && agg.getLong(1) == 75L && agg.getLong(2) == 1L)
    // the newline before the span and the ' \n' after it both survive
    val one = out.filter(col("doc_id") === 0L).collect()(0).getString(1)
    assert(one.contains("\n \n"), "framing whitespace must survive the splice")
  }

  test("plan shape: one shingle-count exchange, no cartesian") {
    val plan = ExactSpans.planted(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("small-k fixture: 12-token span removed at k=8, 7-token span kept; " +
      "k=50 default leaves the same corpus untouched") {
    val out = ExactSpans.plantedShortScrub(spark, Sf).persist()
    val agg = out.agg(min(col("removed_tokens")), max(col("removed_tokens")),
      min(col("n_spans")), max(col("n_spans"))).collect()(0)
    assert(agg.getLong(0) == 12L && agg.getLong(1) == 12L)
    assert(agg.getLong(2) == 1L && agg.getLong(3) == 1L)
    val one = out.filter(col("doc_id") === 0L).collect()(0).getString(1)
    out.unpersist()
    assert(one.contains("n0v0 n0v1"), "sub-threshold 7-token span must survive")
    assert(!one.contains("m0w0"), "12-token span must be gone")
    // at the production k=50 floor the same corpus has no span >= k:
    // the knob, not the operator, decides the granularity
    val fixture = ExactSpans.plantedShort(
      Tables.documents(spark, Sf).select(col("doc_id")))
    val atDefault = ExactSpans.scrub(fixture)
      .agg(max(col("removed_tokens"))).collect()(0).getLong(0)
    assert(atDefault == 0L)
  }
}
