package graft

import org.apache.spark.sql.functions._

import graft.text.Signals

class SignalsSpec extends SparkSuite {

  import spark.implicits._

  private def toks(p: String, n: Int): String =
    (0 until n).map(i => s"$p$i").mkString(" ")

  test("novelty: copies score 0, unique docs 10000, within-doc repeats are NOT novel") {
    val k = 4
    val shared = toks("s", 8)
    val rep = toks("r", 4) // one window, repeated within doc 4
    val df = Seq(
      (1L, shared), (2L, shared), // exact copies -> nothing novel
      (3L, toks("u", 8)), // fully unique
      (4L, s"$rep $rep"), // its repeated window occurs twice -> not novel
      (5L, "a b c")) // sub-k: absent
      .toDF("doc_id", "text")
    val got = Signals.novelty(df, k).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L)._3 == 0L && got(2L)._3 == 0L)
    assert(got(3L) == (5L, 5L, 10000L))
    // doc 4: 5 windows; the pure-r window appears at positions 0 and 4
    // (occ 2 -> not novel); the straddling windows are unique
    assert(got(4L)._1 == 5L && got(4L)._2 == 3L)
    assert(!got.contains(5L), "sub-k docs carry no windows")
  }

  test("vocab coverage: exact curve on a hand-built corpus, monotone, total at 10000") {
    // counts: a=6, b=3, c=1 -> total 10
    val df = Seq((1L, "a a a b b c"), (2L, "a a a b")).toDF("doc_id", "text")
    val got = Signals.vocabCoverage(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 50% of 10 = 5 -> 'a' alone (6) covers; 75% = 7.5 -> a+b (9);
    // 90% = 9 -> a+b (9); 95% = 9.5 -> a+b+c (10); 99%, 100% -> all 3
    assert(got(5000L) == (1L, 6L))
    assert(got(7500L) == (2L, 9L))
    assert(got(9000L) == (2L, 9L))
    assert(got(9500L) == (3L, 10L))
    assert(got(9900L) == (3L, 10L))
    assert(got(10000L) == (3L, 10L))
    val sizes = Signals.CoverageBp.map(bp => got(bp.toLong)._1)
    assert(sizes == sizes.sorted, "curve must be monotone")
  }

  test("fixture: every doc's novelty in [0, 10000]; coverage curve ends at the full vocab") {
    val nv = Signals.novelty(Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text"))).collect()
    assert(nv.nonEmpty)
    nv.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000))
    val cov = Signals.vocabCoverage(Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")))
      .orderBy(col("coverage_bp")).collect()
    val full = cov.last
    assert(full.getLong(0) == 10000L)
    val vocabN = Tables.documents(spark, Sf)
      .select(explode(split(col("text"), " "))).distinct().count()
    assert(full.getLong(1) == vocabN, "the 100% row is the whole vocabulary")
  }
}
