package graft

import org.apache.spark.sql.functions._
import graft.text.Unicode

class UnicodeSpec extends SparkSuite {

  private def nfcOf(ss: String*): Seq[String] = {
    import spark.implicits._
    ss.toDF("s").select(Unicode.nfc(col("s"))).collect().map(_.getString(0)).toSeq
  }

  test("composition cases: combining marks, Hangul, singletons, non-composable") {
    val out = nfcOf(
      "cafe\u0301",       // e + combining acute -> \u00e9
      "man\u0303ana",     // n + combining tilde -> \u00f1
      "\u1100\u1161",     // Hangul L+V jamo -> \uac00
      "\u212B",           // Angstrom sign -> U+00C5 singleton
      "x\u0308\u0301",    // partial: x+diaeresis -> U+1E8D, acute remains
      "q\u0308",          // genuinely non-composable: stays 2 codepoints
      "plain ascii")
    assert(out(0) == "caf\u00e9")
    assert(out(1) == "ma\u00f1ana")
    assert(out(2) == "\uac00")
    assert(out(3) == "\u00c5")
    assert(out(4) == "\u1e8d\u0301", "first mark composes, second remains")
    assert(out(5) == "q\u0308", "marks with no precomposed form must not change")
    assert(out(6) == "plain ascii")
  }

  test("idempotent: NFC(NFC(x)) == NFC(x) on the planted corpus") {
    val once = Unicode.nfcNormalized(spark, Sf).select("doc_id", "norm")
    val twice = once.select(col("doc_id"), Unicode.nfc(col("norm")).as("norm2"))
    val diff = once.join(twice, "doc_id")
      .filter(col("norm") =!= col("norm2")).count()
    assert(diff == 0)
  }

  test("codepoint counts shrink exactly by the number of compositions") {
    val rows = Unicode.nfcNormalized(spark, Sf).orderBy("doc_id").limit(30).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // one composition from cafe+acute, one per planted n-tilde and Hangul,
      // one from x+diaeresis (the acute survives); the U+212B singleton maps
      // 1 codepoint to 1 codepoint, so it never changes the count
      var drop = 1
      if (id % 2 == 0) drop += 1
      if (id % 3 == 0) drop += 1
      if (id % 7 == 0) drop += 1
      assert(r.getAs[Int]("n_raw") - r.getAs[Int]("n_nfc") == drop, s"doc $id")
    }
  }

  test("plan is map-only") {
    val plan = Unicode.nfcNormalized(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"))
  }
}
