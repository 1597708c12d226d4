package graft

import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.functions._
import graft.plans.NGramPolyHash

class NGramPolyHashSpec extends SparkSuite {

  private def ngramCol(c: org.apache.spark.sql.Column, n: Int) =
    GraftColumnShim.column(NGramPolyHash(GraftColumnShim.expression(c), n))

  test("hash set matches a direct per-window computation") {
    import spark.implicits._
    val s = "abcdef"
    val got = Seq(s).toDF("t").select(ngramCol(col("t"), 3)).collect()(0).getSeq[Long](0).toSet
    def h(win: String): Long =
      win.codePoints().toArray.foldLeft(0L)((a, c) => (a * NGramPolyHash.B + c) % NGramPolyHash.P)
    assert(got === Set("abc", "bcd", "cde", "def").map(h))
  }

  test("short strings yield empty; null yields null; duplicates collapse") {
    import spark.implicits._
    val df = Seq(Some("ab"), None, Some("aaaa")).toDF("t").select(ngramCol(col("t"), 3).as("h"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](0).isEmpty)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getSeq[Long](0).length === 1, "aaa+aaa dedups to one hash")
  }

  test("unicode codepoints are hashed, not UTF-16 units") {
    import spark.implicits._
    val got = Seq("中中中").toDF("t").select(ngramCol(col("t"), 3)).collect()(0).getSeq[Long](0)
    val cp = "中".codePointAt(0).toLong
    val expect = ((cp * NGramPolyHash.B + cp) % NGramPolyHash.P * NGramPolyHash.B + cp) % NGramPolyHash.P
    assert(got === Seq(expect))
  }

  test("expression participates in whole-stage codegen over a real scan") {
    val q = Tables.documents(spark, Sf).select(ngramCol(col("text"), 5).as("h"))
    val plan = q.queryExecution.executedPlan.toString
    val line = plan.split("\n").find(_.contains("ngram_poly_hash")).getOrElse("")
    assert(line.trim.startsWith("*("), s"ngram_poly_hash must sit in a codegen stage:\n$plan")
    assert(q.select(sum(size(col("h")))).collect()(0).getLong(0) > 0)
  }
}
