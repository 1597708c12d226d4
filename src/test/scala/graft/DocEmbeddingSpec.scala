package graft

import org.apache.spark.sql.functions._
import graft.sim.{DocEmbedding, Similarity}

class DocEmbeddingSpec extends SparkSuite {

  test("doc embedding equals the hand-computed token-vector mean on a tiny corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-docemb").toString
    // two vocab slots' worth of vectors is enough: copy the real fixture
    // slice so quantization matches production exactly
    val wv = Similarity.quantized(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < DocEmbedding.VocabSlots)
      .select(col("vec_id"), col("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

    Seq(
      (1L, "alpha beta gamma"),   // three tokens, no stopwords stripped
      (2L, "the of and"),         // all stopwords → no embedding row at all
      (3L, "alpha alpha")         // duplicate token counts twice
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // reuse the REAL embeddings fixture as the vocab table
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def slot(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) % DocEmbedding.VocabSlots
    }
    // lemmatizer: alpha/beta/gamma unchanged (no matching suffix rules)
    val got = DocEmbedding.docEmbedding(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap

    assert(!got.keys.exists(_._1 == 2L), "all-stopword doc must have no embedding")
    val dims = wv(slot("alpha")).length
    assert(got.count(_._1._1 == 1L) == dims && got.count(_._1._1 == 3L) == dims)
    (0 until dims).foreach { d =>
      val want1 = wv(slot("alpha"))(d) + wv(slot("beta"))(d) + wv(slot("gamma"))(d)
      assert(got((1L, d.toLong)) == ((want1, 3L)), s"doc 1 dim $d")
      val want3 = 2 * wv(slot("alpha"))(d)
      assert(got((3L, d.toLong)) == ((want3, 2L)), s"doc 3 dim $d")
    }
  }

  test("vocab lookup broadcasts; no sort-merge join in the plan") {
    val plan = DocEmbedding.docEmbedding(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "word-vector join must broadcast")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }
}
