package graft

import org.apache.spark.sql.functions._

import graft.text.Sentences

class SentencesSpec extends SparkSuite {

  import spark.implicits._

  private def segs(text: String): Seq[String] =
    Sentences.segments(Seq((1L, text)).toDF("doc_id", "text"))
      .orderBy(col("seg_idx")).collect().map(_.getString(2)).toSeq

  test("plain sentences split at terminator runs") {
    assert(segs("One two. Three four! Five six?") ==
      Seq("One two.", "Three four!", "Five six?"))
  }

  test("abbreviations, initials, and lowercase continuations merge back") {
    assert(segs("Dr. Smith arrived. He sat.") ==
      Seq("Dr. Smith arrived.", "He sat."))
    assert(segs("J. R. Tolkien wrote. Approved!") ==
      Seq("J. R. Tolkien wrote.", "Approved!"))
    assert(segs("It works vs. the baseline. Done.") ==
      Seq("It works vs. the baseline.", "Done."))
    assert(segs("End of part one. and a lowercase continuation.") ==
      Seq("End of part one. and a lowercase continuation."))
  }

  test("ellipsis ends a sentence when the next starts capitalized") {
    assert(segs("Wait... Then done. Yes!") == Seq("Wait...", "Then done.", "Yes!"))
  }

  test("abbreviation rule never fires mid-word (badr. is not Dr.)") {
    assert(segs("He met badr. Next one.") == Seq("He met badr.", "Next one."))
  }

  test("no trailing terminator: one segment, text unchanged") {
    assert(segs("tail fragment without end") == Seq("tail fragment without end"))
  }

  test("variant alignment: segmentation feeds the DP, beads are 1-1/2-1/1-1") {
    val beads = Sentences.variantAligned(spark, Sf)
      .select(col("bead"), col("a_count"), col("b_count")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(beads == Seq((0, 1, 1), (1, 2, 1), (2, 1, 1)))
  }

  test("plan shape: windows keyed by document, no cartesian") {
    val plan = Sentences.planted(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val aplan = Sentences.variantAligned(spark, Sf).queryExecution.executedPlan.toString
    assert(!aplan.contains("CartesianProduct"), aplan)
  }
}
