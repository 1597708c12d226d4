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

  // --- real header decode, against GENUINE encoder output: the JDK's
  // ImageIO writes real PNG/JPEG/GIF files, so these golden tests parse
  // bytes produced by an independent implementation, not hand-assembled
  // fixtures that could share the parser's own misconceptions.

  private def encoded(fmt: String, imgType: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    var x = 0
    while (x < w) { img.setRGB(x, x % h, 0xff3366 + x); x += 1 } // non-trivial content
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos), s"JDK has no $fmt writer")
    baos.toByteArray
  }

  private def parsed(bytes: Array[Byte]): (String, Option[Int], Option[Int], Option[Int]) = {
    val r = graft.plans.ImageHeader.parse(bytes)
    def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getInt(i))
    (r.getUTF8String(0).toString, opt(1), opt(2), opt(3))
  }

  test("header decode reads dims and channels from JDK-encoded images") {
    import java.awt.image.BufferedImage._
    assert(parsed(encoded("png", TYPE_3BYTE_BGR, 37, 23)) === (("png", Some(37), Some(23), Some(3))))
    assert(parsed(encoded("png", TYPE_INT_ARGB, 5, 9)) === (("png", Some(5), Some(9), Some(4))))
    assert(parsed(encoded("png", TYPE_BYTE_GRAY, 640, 480)) === (("png", Some(640), Some(480), Some(1))))
    assert(parsed(encoded("jpg", TYPE_3BYTE_BGR, 128, 64)) === (("jpeg", Some(128), Some(64), Some(3))))
    assert(parsed(encoded("jpg", TYPE_BYTE_GRAY, 31, 17)) === (("jpeg", Some(31), Some(17), Some(1))))
    val (gf, gw, gh, _) = parsed(encoded("gif", TYPE_3BYTE_BGR, 77, 13))
    assert((gf, gw, gh) === (("gif", Some(77), Some(13))))
  }

  test("header decode yields unknown/null on garbage and truncation") {
    assert(parsed("not an image at all".getBytes)._1 === "unknown")
    assert(parsed(Array[Byte]()) === (("unknown", None, None, None)))
    // valid JPEG SOI but truncated before any SOF: format detected, dims null
    val trunc = encoded("jpg", java.awt.image.BufferedImage.TYPE_3BYTE_BGR, 10, 10).take(6)
    assert(parsed(trunc) === (("jpeg", None, None, None)))
  }

  test("header decode participates in whole-stage codegen (no silent fallback)") {
    // AQE's unexecuted adaptive wrapper reports zero codegen subtrees
    // whatever the stages contain — pin the static plan for this check
    val code = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      org.apache.spark.sql.execution.debug.codegenString(
        Multimodal.headerDecode(spark, Sf).queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(code.contains("graft.plans.ImageHeader.parse"),
      "generated code must call the static parser — interpreted fallback means doGenCode broke")
    assert(!code.contains("Found 0 WholeStageCodegen subtrees"), code.linesIterator.take(3).mkString("\n"))
  }

  test("wav header decode reads rate/channels/bits/frames from JDK-encoded audio") {
    import javax.sound.sampled._
    def wav(rate: Float, bits: Int, chans: Int, nFrames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, bits, chans, true, false)
      val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    def parsed(bytes: Array[Byte]) = {
      val r = graft.plans.WavHeader.parse(bytes)
      (if (r.isNullAt(0)) -1 else r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), if (r.isNullAt(3)) -1L else r.getLong(3))
    }
    assert(parsed(wav(44100f, 16, 2, 500)) === ((44100, 2, 16, 500L)))
    assert(parsed(wav(8000f, 8, 1, 123)) === ((8000, 1, 8, 123L)))
    assert(parsed(wav(48000f, 24, 2, 7)) === ((48000, 2, 24, 7L)))
    assert(parsed("RIFFxxxxnope".getBytes) === ((-1, -1, -1, -1L)))
    assert(parsed(Array[Byte]()) === ((-1, -1, -1, -1L)))
  }

  test("pcm decode: JDK-encoded samples round-trip bit-exact; non-PCM → nulls") {
    import javax.sound.sampled._
    // golden: known int16 samples through the JDK's WAV encoder, read
    // back by WavPcm — byte order and sign extension are load-bearing
    val samples = Array[Short](0, 1, -1, 1000, -1000, 32767, -32768, 12345, -54.toShort)
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    val r = graft.plans.WavPcm.parse(baos.toByteArray)
    assert(r.getLong(0) === samples.length.toLong)
    assert(r.getLong(1) === samples.map(s => math.abs(s.toLong)).sum)
    assert(r.getLong(2) === 32768L)
    assert(r.getLong(3) === 2L) // 32767 and -32768 both clip
    // truncated data chunk: stats over the bytes actually present
    val whole = baos.toByteArray
    val cut = java.util.Arrays.copyOf(whole, whole.length - 4) // drop 2 samples
    val rc = graft.plans.WavPcm.parse(cut)
    assert(rc.getLong(0) === samples.length - 2L)
    // 8-bit (non-decodable depth) and garbage → nulls inside the struct
    val fmt8 = new AudioFormat(8000f, 8, 1, false, false)
    val ais8 = new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](10)), fmt8, 10L)
    val b8 = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais8, AudioFileFormat.Type.WAVE, b8)
    assert(graft.plans.WavPcm.parse(b8.toByteArray).isNullAt(0))
    assert(graft.plans.WavPcm.parse("RIFFxxxxnope".getBytes).isNullAt(0))
    assert(graft.plans.WavPcm.parse(Array[Byte]()).isNullAt(0))
  }

  test("planted pcm decodes end-to-end: stats match the planted arithmetic") {
    val rows = Multimodal.pcmStats(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val vs = (0L until (16 + id % 17)).map { i =>
        (if ((id + i) % 50 == 0) 65535L
         else (id * 7919 + i * 104729) % 65536) - 32768
      }
      assert(r.getLong(1) === vs.length.toLong, s"n_samples for $id")
      assert(r.getLong(2) === vs.map(math.abs).sum, s"sum_abs for $id")
      assert(r.getLong(3) === vs.map(math.abs).max, s"peak for $id")
      assert(r.getLong(4) === vs.count(v => v == 32767 || v == -32768).toLong,
        s"clip_count for $id")
    }
    // the plant produces genuine clips somewhere in the fixture
    assert(rows.map(_.getLong(4)).sum > 0, "no planted clips — the clip rule is untested")
  }

  test("planted wav headers decode end-to-end with the planted parameters") {
    val rows = Multimodal.audioHeaderDecode(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 8000 + (id % 4).toInt * 8000)
      assert(r.getInt(2) === 1 + (id % 2).toInt)
      assert(r.getInt(3) === 8 * (1 + (id % 3).toInt))
      assert(r.getLong(4) === 100 + id % 900)
    }
  }

  test("planted headers decode through the codegen'd expression end-to-end") {
    val out = Multimodal.headerDecode(spark, Sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) === Seq("png", "gif", "jpeg")((id % 3).toInt))
      assert(r.getInt(2) === 16 + (id % 317).toInt)
      assert(r.getInt(3) === 16 + (id % 211).toInt)
    }
  }
}
