package graft

import org.apache.spark.sql.functions._
import graft.text.Paragraphs

class ParagraphsSpec extends SparkSuite {

  test("global keep-first: the earliest (doc_id, idx) occurrence survives, all others drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "unique one\n\nshared footer"),
      (2L, "shared footer\n\nunique two"),
      (3L, "shared footer\n\nshared footer")).toDF("doc_id", "text")
    val got = Paragraphs.dedupParagraphs(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 0L, "unique one\n\nshared footer")),
      "doc 1 owns the first occurrence")
    assert(got(2L) == ((1L, 1L, "unique two")))
    assert(got(3L) == ((0L, 2L, "")), "a doc of only repeats empties out")
  }

  test("fixture replay: keep set matches a driver-side recompute of the plant") {
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    val paras = docs.toSeq.sortBy(_._1).flatMap { case (id, text) =>
      (1 to 3).map { j =>
        val p = if ((id + j) % 4 == 0)
          s"common section ${(id + j) % 7} applies to all mirrors."
        else {
          val from = j * 7 - 1
          val sub = if (from >= text.length) ""
            else text.substring(from, math.min(from + 20, text.length))
          s"doc $id body $j: $sub"
        }
        (id, j - 1, p)
      }
    }
    val firstOf = paras.groupBy(_._3).view.mapValues(_.minBy(t => (t._1, t._2))).toMap
    val expected = paras.groupBy(_._1).map { case (id, ps) =>
      val kept = ps.filter(p => firstOf(p._3) == p)
      id -> ((kept.size.toLong, (ps.size - kept.size).toLong,
        kept.sortBy(_._2).map(_._3).mkString("\n\n")))
    }
    val got = Paragraphs.deduped(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) == v, s"doc $k") }
  }

  test("plan shape: one digest window exchange + one doc-keyed aggregate, no join") {
    val plan = Paragraphs.deduped(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected exactly 2 exchanges, got $exchanges\n$plan")
  }
}
