package graft

import org.apache.spark.sql.functions._
import graft.text.Stemmer

class StemmerSpec extends SparkSuite {

  /** Every planted probe word, with the term the full chain must yield —
    * one word per rule in the Porter-lite set (possessive, 1a, 1b +
    * undouble, 1c, each derivational row).
    */
  private val Expected = Map(
    "relational"    -> "relate",
    "realization"   -> "realize",
    "effectiveness" -> "effective",
    "hopefulness"   -> "hopeful",
    "nervousness"   -> "nervous",
    "conditional"   -> "condition",
    "agreed"        -> "agree",
    "hoped"         -> "hop",
    "running"       -> "run",
    "ponies"        -> "poni",
    "caresses"      -> "caress",
    "cats"          -> "cat",
    "happy"         -> "happi",
    "john's"        -> "john",
    "donation"      -> "donate",
    "operator"      -> "operate",
    "formalism"     -> "formal")

  private def stemChain(c: org.apache.spark.sql.Column) =
    Stemmer.derivational(Stemmer.yToI(Stemmer.edIng(Stemmer.plural(Stemmer.possessive(c)))))

  test("each probe word fires its rule and stems to the expected term") {
    import spark.implicits._
    val got = Stemmer.ProbeWords.toDF("w")
      .select(col("w"), stemChain(col("w")).as("term"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Expected)
    // the probe set covers the rule table: every derivational suffix is hit
    val firedSuffixes = Stemmer.Derivational.map(_._1).filter(s => Expected.keys.exists(_.endsWith(s)))
    assert(firedSuffixes.size === Stemmer.Derivational.size,
      "probe words must exercise every derivational row")
  }

  test("stemming is idempotent-safe on non-matching words and short tokens") {
    import spark.implicits._
    val neutral = Seq("a", "i", "it", "the", "spark", "graft", "ss", "bus")
    val got = neutral.toDF("w").select(stemChain(col("w"))).collect().map(_.getString(0)).toSeq
    // short tokens pass through untouched except 'bus' (>3 chars keeps its
    // final s? no: 'bus' is length 3, the 1a 's' rule needs length > 3)
    assert(got === Seq("a", "i", "it", "the", "spark", "graft", "ss", "bus"))
  }

  test("q_english_analyze adds no shuffle: only widen's round-robin exchange") {
    val df = Stemmer.englishTerms(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"stemmer grew a hash shuffle:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"), s"stemmer grew a range shuffle:\n$plan")
    assert(df.limit(1).count() === 1)
  }

  test("term stream preserves positions and is non-empty on the fixture") {
    val df = Stemmer.englishTerms(spark, Sf).filter(col("doc_id") === 0)
    val rows = df.orderBy("pos").collect()
    assert(rows.nonEmpty)
    // positions are the post-stopword token positions: dense from 0
    assert(rows.map(_.getLong(1)).toSeq === (0L until rows.length).toSeq)
  }
}
