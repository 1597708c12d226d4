package graft

import org.apache.spark.sql.functions._
import graft.text.{Contamination, Repetition, TextOps}

class ContaminationRepetitionSpec extends SparkSuite {

  test("contamination flags n-gram overlap with the benchmark subset and nothing else") {
    import spark.implicits._
    // doc 0 and 20 are benchmark (doc_id % 20 == 0); 1 copies 20's text
    // (fully contaminated), 21 shares a 5-token window with 0, 2 is
    // unrelated, 3 is too short for any 5-gram (scores 0, stays present)
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, "one two three four five six seven eight nine ten"),
      (20L, benchText),
      (1L, benchText),
      (21L, "zz one two three four five qq rr ss tt uu"),
      (2L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
      (3L, "too short")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-contam").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Contamination.contamination(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 21L), "benchmark docs excluded, all others present")
    assert(out(1L)._1 == 6 && out(1L)._2, "identical text shares all 6 distinct 5-grams")
    assert(out(21L)._1 == 1 && out(21L)._2, "one shared 5-token window = one shared 5-gram")
    assert(out(2L) == ((0L, false)) && out(3L) == ((0L, false)))
  }

  test("bloom-prefiltered path is bit-identical to the broadcast path") {
    // no false negatives (Bloom) + exact verify join (kills the fpp
    // sliver) = same rows; the scale difference is what's broadcast
    val exact = Contamination.contamination(spark, Sf)
      .orderBy("doc_id").collect().toSeq
    val bloom = Contamination.bloomContamination(spark, Sf)
      .orderBy("doc_id").collect().toSeq
    assert(exact == bloom)
  }

  test("bloom path never broadcasts the eval gram list: sketch prefilter + shuffle verify") {
    val df = Contamination.bloomContamination(spark, Sf)
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("might_contain"), s"bloom prefilter missing:\n$p")
    assert(p.contains("ShuffledHashJoin"),
      s"verify join must shuffle, not broadcast the eval-sized side:\n$p")
  }

  test("repetition metrics: degenerate repeat scores 1.0, all-distinct scores 0") {
    import spark.implicits._
    val df = Seq(
      (0L, "a a a a"),
      (1L, "w x y z q"),
      (2L, "one"),
      (3L, "spam ham spam ham spam ham")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.tokenize(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"),
        Repetition.bigramsOf(col("tk")).as("bg"), Repetition.trigramsOf(col("tk")).as("tg"))
    val cols = Repetition.metricCols(col("tk"), col("bg"), col("tg"))
      .map { case (n, c) => c.as(n) }
    val rows = df.select(col("doc_id") +: cols: _*).collect()
      .map(r => r.getLong(0) -> r).toMap
    // "a a a a": 4 tokens 1 distinct → dup 0.75; bigrams all "a a" → 1.0
    assert(rows(0L).getDouble(2) == 0.75 && rows(0L).getDouble(3) == 1.0 &&
      rows(0L).getDouble(4) == 1.0)
    // all-distinct tokens: 4 bigrams each once → top 1/4
    assert(rows(1L).getDouble(2) == 0.0 && rows(1L).getDouble(3) == 0.25 &&
      rows(1L).getDouble(4) == 0.0)
    // single token: no bigrams/trigrams → null fracs, dup 0
    assert(rows(2L).getDouble(2) == 0.0 && rows(2L).isNullAt(3) && rows(2L).isNullAt(4))
    // "spam ham"×3: 6 tokens 2 distinct → dup 4/6 = 0.6667;
    // bigrams: [spam ham, ham spam, spam ham, ham spam, spam ham] → top 3/5
    assert(rows(3L).getDouble(2) == 0.6667 && rows(3L).getDouble(3) == 0.6)
  }
}
