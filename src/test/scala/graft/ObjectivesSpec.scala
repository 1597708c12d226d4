package graft

import org.apache.spark.sql.functions._

import graft.text.Objectives

/** The objective transforms' invariants: both are LOSSLESS re-arrangements
  * — the original document reconstructs exactly from (input, target) /
  * psm — and the corruption rate lands where T5's recipe aims.
  */
class ObjectivesSpec extends SparkSuite {

  import spark.implicits._

  private lazy val docs = Tables.documents(spark, Sf)
    .select(col("doc_id"), col("text"))

  test("span corruption round-trips: splicing target spans into input rebuilds the doc") {
    val rows = Objectives.spanCorrupt(docs)
      .join(docs, "doc_id")
      .select(col("doc_id"), col("input"), col("target"), col("text"))
      .collect()
    assert(rows.length == docs.count())
    val Sentinel = "<extra_id_(\\d+)>".r
    rows.foreach { r =>
      val (input, target, text) = (r.getString(1), r.getString(2), r.getString(3))
      // target = <extra_id_0> span0 <extra_id_1> span1 ... <extra_id_n>
      val parts = Sentinel.split(target).map(_.trim)
      val ids = Sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      assert(ids == ids.indices.toSeq, s"sentinels must be consecutive: $ids")
      val spanOf = ids.zip(parts.drop(1) ++ Seq("")).toMap
      val rebuilt = Sentinel.replaceAllIn(input,
        m => java.util.regex.Matcher.quoteReplacement(spanOf(m.group(1).toInt)))
      assert(rebuilt == text, s"doc ${r.getLong(0)} failed round-trip")
    }
  }

  test("corruption rate sits in the T5 band; short docs pass through unmasked") {
    val stats = Objectives.spanCorrupt(docs)
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n")), "doc_id")
      .agg(sum(col("n")).as("toks"),
        sum(col("n") - size(split(col("input"), " ")) + col("n_spans")).as("masked"))
      .collect()(0)
    val rate = stats.getLong(1).toDouble / stats.getLong(0)
    assert(rate > 0.10 && rate < 0.20, s"corruption rate $rate outside the T5 band")
    val short = Objectives.spanCorrupt(Seq((1L, "a b c")).toDF("doc_id", "text"))
      .collect()(0)
    assert(short.getString(1) == "a b c" && short.getString(2) == "<extra_id_0>"
      && short.getLong(3) == 0L)
  }

  test("fim round-trips: prefix + middle + suffix rebuilds the doc; cuts ordered") {
    val rows = Objectives.fim(docs)
      .join(docs, "doc_id")
      .select(col("psm"), col("p1"), col("p2"), col("text")).collect()
    assert(rows.nonEmpty)
    val Psm = "(?s)<PRE> (.*) <SUF> (.*) <MID> (.*)".r
    rows.foreach { r =>
      val Psm(pre, suf, mid) = r.getString(0)
      val rebuilt = Seq(pre, mid, suf).filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == r.getString(3))
      assert(r.getLong(1) < r.getLong(2))
      assert(mid.nonEmpty, "middle must never be empty")
    }
    // sub-3-token docs carry no sample
    assert(Objectives.fim(Seq((1L, "a b")).toDF("doc_id", "text")).count() == 0)
  }

  test("plan shape: both transforms are map-only (no exchange, no join)") {
    Seq(Objectives.spanCorrupt(docs), Objectives.fim(docs)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1200))
      assert(!plan.contains("Join"), plan.take(1200))
    }
  }
}
