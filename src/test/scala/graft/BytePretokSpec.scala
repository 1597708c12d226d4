package graft

import org.apache.spark.sql.functions._
import graft.plans.BytePretokenize

class BytePretokSpec extends SparkSuite {

  private def toks(s: String): Seq[String] = {
    val arr = BytePretokenize.split(s)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("known GPT-2 splits: words, leading spaces, contractions, punct") {
    assert(toks("Hello world!") == Seq("Hello", "Ġworld", "!"))
    assert(toks("don't stop") == Seq("don", "'t", "Ġstop"))
    assert(toks("I'll we've he's") == Seq("I", "'ll", "Ġwe", "'ve", "Ġhe", "'s"))
    assert(toks("a1b2") == Seq("a", "1", "b", "2"))
    assert(toks("x  y") == Seq("x", "Ġ", "Ġy"),
      "interior run: prefix stands alone, last space attaches")
    assert(toks("x   y") == Seq("x", "ĠĠ", "Ġy"))
    assert(toks("x \n y") == Seq("x", "ĠĊ", "Ġy"),
      "mixed whitespace runs split the same way")
    assert(toks("tail  ") == Seq("tail", "ĠĠ"),
      "trailing whitespace stands alone (the lookahead branch)")
    assert(toks("") == Seq())
  }

  test("byte map: space is Ġ (U+0120), newline Ċ (U+010A), printables identity") {
    assert(BytePretokenize.ByteToUni(32) == 'Ġ')
    assert(BytePretokenize.ByteToUni(10) == 'Ċ')
    assert(BytePretokenize.ByteToUni('a'.toInt) == 'a')
    assert(BytePretokenize.ByteToUni(127) == 'ġ')
    // bijection: 256 distinct images
    assert(BytePretokenize.ByteToUni.toSet.size == 256)
  }

  test("non-ASCII goes through BYTES: café maps its two-byte é") {
    // é = 0xC3 0xA9; both printable bytes -> themselves as code points
    assert(toks("café") == Seq("cafÃ©"))
    // CJK: three bytes each, all >= 0xE0 printable
    assert(toks("日")(0).length == 3)
  }

  test("lossless: decode(concat(pretokens)) round-trips the whole corpus") {
    val texts = Tables.documents(spark, Sf).select("text").collect().map(_.getString(0))
    texts.foreach { t =>
      val back = BytePretokenize.decode(toks(t).mkString)
      assert(back == t, s"round trip failed for: ${t.take(60)}…")
    }
    // and for pathological whitespace/unicode strings
    Seq("a  b\t\tc\n\n", " lead", "trail ", "naïve — café…", "日本 text")
      .foreach { t =>
        assert(BytePretokenize.decode(toks(t).mkString) == t, t)
      }
  }

  test("gate plan is a per-row generate over the scan — no shuffle") {
    val plan = text.BytePretok.pretokens(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("hashpartitioning")
      || plan.contains("roundrobin"), s"pretokenize must stay map-side:\n$plan")
  }
}
