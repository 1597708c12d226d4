package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup.Cdc

/** Duplicated-span removal at CDC-chunk granularity: planted shared
  * passages are cut from every document containing them, untouched docs
  * round-trip exactly, and the fixture actually exercises the drop path.
  */
class CdcScrubSpec extends SparkSuite {
  import spark.implicits._

  test("a passage planted in two docs is cut from both; unique text survives") {
    // the shared passage is long enough to span whole CDC chunks; the
    // unique prefixes/suffixes differ so their chunks stay unique
    val passage = ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 8).trim
    val docs = Seq(
      (1L, s"unique-head-one $passage unique-tail-one"),
      (2L, s"other-head-two $passage other-tail-two"),
      (3L, "entirely unrelated content with nothing shared at all")
    ).toDF("doc_id", "text")
    val out = Cdc.scrubOf(docs).collect().map(r => r.getLong(0) -> r).toMap

    val d1 = out(1L); val d2 = out(2L); val d3 = out(3L)
    assert(d1.getAs[Long]("n_dropped") > 0, "doc 1 kept the shared passage")
    assert(d2.getAs[Long]("n_dropped") > 0, "doc 2 kept the shared passage")
    assert(d3.getAs[Long]("n_dropped") == 0)
    assert(d3.getAs[String]("clean_text") ==
      "entirely unrelated content with nothing shared at all")
    // scrubbed docs keep their unique edges
    assert(d1.getAs[String]("clean_text").contains("unique-head-one"))
    assert(d2.getAs[String]("clean_text").contains("other-head-two"))
    // and the shared middle is (at least partly) gone
    assert(d1.getAs[Long]("clean_len") < docs.filter($"doc_id" === 1L)
      .select(length($"text")).collect()(0).getInt(0))
  }

  test("chunks partition the text: n_dropped = 0 docs round-trip exactly") {
    val docs = Tables.documents(spark, Sf)
    val out = Cdc.scrubOf(docs)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
    val untouched = out.filter(col("n_dropped") === 0)
    assert(untouched.count() > 0)
    assert(untouched.filter(col("clean_text") =!= col("text")).count() == 0,
      "reassembly of all chunks must reproduce the original text")
    // every row accounts for its whole document: clean_len + dropped size
    // never exceeds the original length
    assert(out.filter(length(col("text")) < col("clean_len")).count() == 0)
  }

  test("the fixture exercises the drop path (shared chunks exist)") {
    val out = Cdc.scrubSharedSpans(spark, Sf)
    assert(out.filter(col("n_dropped") > 0).count() > 0,
      "no shared chunks in fixture — gate would not exercise removal")
  }

  test("recall gate: measured floors of the CDC proxy vs exact planted spans") {
    // sf0.01 measured (r11): recall avg 7175 bp / min 1867 bp (one
    // unlucky span with sparse content-defined boundaries — the honest
    // weakness of the proxy vs a suffix array, now a number instead of
    // a claim); precision avg 9996 / min 9854 bp (tiny-chunk
    // cross-matches). Floors sit under the measurement so regression,
    // not noise, trips them.
    val r = Cdc.spanRecall(spark, Sf)
      .agg(avg(col("recall_bp")).as("ar"), min(col("precision_bp")).as("mp"),
        avg(col("precision_bp")).as("ap"),
        max(col("removed") - col("removed_in_span")).as("leak"))
      .collect()(0)
    assert(r.getDouble(0) >= 6500, s"avg recall ${r.getDouble(0)} bp under floor")
    assert(r.getLong(1) >= 9000, s"min precision ${r.getLong(1)} bp under floor")
    assert(r.getDouble(2) >= 9800, s"avg precision ${r.getDouble(2)} bp under floor")
    // out-of-span removal stays at tiny-chunk scale, never a word run
    assert(r.getLong(3) <= 32, s"out-of-span removal ${r.getLong(3)} chars")
  }
}
