package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup.Cdc

class CdcChunksSpec extends SparkSuite {

  test("chunks reassemble to the original text, in order, with no empty chunks") {
    val docs = Tables.documents(spark, Sf).limit(100)
    val out = docs.select(col("doc_id"), col("text"), Cdc.chunkCol(col("text")).as("ch"))
      .select(col("doc_id"), col("text"), concat_ws("", col("ch")).as("joined"),
        size(filter(col("ch"), c => length(c) === 0)).as("empties"))
    assert(out.filter(col("joined") =!= col("text")).count() === 0,
      "concatenating chunks must reproduce the document byte-for-byte")
    assert(out.filter(col("empties") > 0).count() === 0)
  }

  test("boundaries are content-local: a shared suffix chunks identically past one window") {
    import spark.implicits._
    // same long tail, different heads -> after the first w-window inside
    // the tail, chunk boundaries coincide, so tail chunks (except the
    // first per doc) are shared
    val tail = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val df = Seq("PREFIX-A " + tail, "completely different lead-in text " + tail)
      .toDF("text")
    val chunks = df.select(explode(Cdc.chunkCol(col("text"))).as("c"))
      .groupBy("c").count().filter(col("count") === 2).count()
    assert(chunks >= 1, "documents sharing a long span must share interior chunks")
  }

  test("short text (under one window) is a single chunk") {
    import spark.implicits._
    val out = Seq("tiny").toDF("t").select(Cdc.chunkCol(col("t"))).head().getSeq[String](0)
    assert(out === Seq("tiny"))
  }

  test("SQL registration: 1-arg and 3-literal-arg forms work, wrong arity errors") {
    import spark.implicits._
    Seq("the quick brown fox jumps over the lazy dog and keeps on running")
      .toDF("text").createOrReplaceTempView("cdc_sql_docs")
    val def1 = spark.sql("SELECT cdc_chunks(text) AS ch FROM cdc_sql_docs")
      .head().getSeq[String](0)
    val expl = spark.sql("SELECT cdc_chunks(text, 16, 64) AS ch FROM cdc_sql_docs")
      .head().getSeq[String](0)
    assert(def1 === expl, "explicit default literals must equal the 1-arg form")
    val wide = spark.sql("SELECT cdc_chunks(text, 16, 2) AS ch FROM cdc_sql_docs")
      .head().getSeq[String](0)
    assert(wide.length >= def1.length, "divisor 2 must cut at least as often")
    intercept[Exception] {
      spark.sql("SELECT cdc_chunks(text, 16) FROM cdc_sql_docs").collect()
    }
  }

  test("fixture sanity: planted near-dups share spans, chunk lengths average near divisor") {
    val shared = Cdc.sharedChunks(spark, Sf)
    assert(shared.count() > 0, "near-dup fixtures must surface shared spans")
    val avgLen = Cdc.chunkTable(spark, Sf).agg(avg("chunk_len")).head().getDouble(0)
    assert(avgLen > 16 && avgLen < 300, s"mean chunk length $avgLen wildly off the divisor design point")
  }
}
