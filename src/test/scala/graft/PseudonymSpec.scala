package graft

import org.apache.spark.sql.functions._
import graft.text.Pseudonym

class PseudonymSpec extends SparkSuite {

  private def scrub(texts: Seq[String]): Seq[String] = {
    import spark.implicits._
    texts.toDF("text").select(Pseudonym.pseudonymize(col("text")))
      .collect().map(_.getString(0)).toSeq
  }

  test("same address -> same surrogate; different -> different") {
    val out = scrub(Seq(
      "mail A@Example.com and a@example.com twice",
      "a@example.com elsewhere",
      "other b@example.com"))
    // case-insensitive keying: A@Example.com and a@example.com share one
    // surrogate token (two distinct literals, one identity)
    val toks = "<EMAIL_[0-9a-f]{6}>".r.findAllIn(out.mkString(" ")).toSeq
    assert(toks.size == 4)
    assert(toks.distinct.size == 2, "two identities -> two distinct surrogates")
    assert(out.head.split("<EMAIL_").length == 3, "both literals replaced")
    assert(!out.exists(_.contains("@")), "no raw address survives")
  }

  test("multi-email docs fold all matches; no-email docs pass through") {
    val out = scrub(Seq("x@y.com then z@w.org end", "plain text"))
    assert(out(0).matches("<EMAIL_[0-9a-f]{6}> then <EMAIL_[0-9a-f]{6}> end"))
    assert(out(1) == "plain text")
  }

  test("vault maps each planted identity once with its document reach") {
    val v = Pseudonym.vault(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(v.nonEmpty)
    assert(v.map(_._1).distinct.length == v.length, "one row per surrogate")
    assert(v.forall(_._1.matches("<EMAIL_[0-9a-f]{6}>")))
    assert(v.exists(_._3 > 1L), "repeating identities must show linkage")
  }
}
