package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.text.Keyword

class KeywordMultimodalSpec extends SparkSuite {

  test("keyword normalizer folds accents after lowercasing") {
    import spark.implicits._
    val out = Seq("Crème BRÛLÉE à côté", "plain ascii", "ŠKODA œuvre", "STRAßE Ætna þorn")
      .toDF("s").select(Keyword.keywordNormalize(col("s"))).collect().map(_.getString(0))
    assert(out(0) == "creme brulee a cote")
    assert(out(1) == "plain ascii")
    assert(out(2) == "skoda oeuvre") // multi-char expansion œ→oe, as ES asciifolding does
    assert(out(3) == "strasse aetna thorn") // ß→ss, æ→ae, þ→th
  }

  test("media table carries a genuine binary column with typed metadata") {
    val mt = Multimodal.mediaTable(spark, Sf)
    val schema = mt.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val r = mt.limit(1).collect()(0)
    val bytes = r.getAs[Array[Byte]]("content")
    val nBytes = r.getStruct(r.fieldIndex("meta")).getLong(1)
    assert(bytes.length.toLong == nBytes)
    mt.show(3) // O3 show(n) surface — smoke
  }

  test("binary metadata counts BYTES, not characters, for multibyte payloads") {
    import spark.implicits._
    val r = Seq("héllo 中").toDF("text")
      .select(octet_length(col("text").cast("binary")).as("b"), length(col("text")).as("c"))
      .collect()(0)
    assert(r.getInt(0) === "héllo 中".getBytes("UTF-8").length)
    assert(r.getInt(1) === 7) // characters
    assert(r.getInt(0) > r.getInt(1), "UTF-8 bytes exceed char count for multibyte text")
  }

  test("fake features are deterministic and stable across evaluations") {
    val a = Multimodal.mediaFeatures(spark, Sf).orderBy("media_id").limit(5).collect()
    val b = Multimodal.mediaFeatures(spark, Sf).orderBy("media_id").limit(5).collect()
    assert(a.sameElements(b))
    assert(a.forall(_.getSeq[Long](3).length == 4))
  }

  test("frame sampling slices strided byte windows of the payload") {
    import spark.implicits._
    val df = Seq("abcdefghij").toDF("s")
      .select(Multimodal.sampleFrames(col("s").cast("binary"), 3, 3).as("frames"))
    val frames = df.collect()(0).getSeq[Array[Byte]](0).map(new String(_))
    assert(frames == Seq("abc", "def", "ghi"))
  }

  test("batched decode constructs the decoder once per partition, not per row") {
    val media = Multimodal.mediaTable(spark, Sf).repartition(3).cache()
    val acc = spark.sparkContext.longAccumulator("decoderInits")
    val out = Multimodal.decodeBatched(media, Some(acc)).cache()
    val rows = out.count()
    assert(rows === media.count() && rows > 3)
    assert(acc.value === 3L, s"decoder must init per partition (3), not per row: ${acc.value}")
    // features deterministic: first UTF-8 byte of each payload
    val sample = out.join(media.select(col("media_id"), col("content")), "media_id")
      .limit(20).collect()
    sample.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("content")
      val expect = if (bytes.isEmpty) -1L else java.lang.Byte.toUnsignedLong(bytes(0))
      assert(r.getAs[Long]("f_head") === expect)
    }
  }

  test("real decoder entry point is a marked stub that refuses to run here") {
    intercept[UnsupportedOperationException] {
      Multimodal.decodeReal(col("x"))
    }
  }
}
