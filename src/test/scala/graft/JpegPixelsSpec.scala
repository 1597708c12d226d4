package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.plans.{JpegPixels, JpegPlant}

/** Golden tests vs the JDK's own (fully independent, libjpeg-derived)
  * ImageIO codec, plus the planted DC-exact arithmetic the DuckDB gate
  * restates. JPEG conformance allows small IDCT variance between
  * implementations, so golden comparisons carry a tolerance: ±1 for
  * single-component images (pure IDCT difference), wider for chroma
  * (ImageIO's fancy upsampling vs our box upsampling).
  */
class JpegPixelsSpec extends SparkSuite {

  private def imageioJpeg(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out), "JDK must encode jpeg")
    out.toByteArray
  }

  test("planted DC-exact JPEGs round-trip the closed-form block arithmetic") {
    val rows = Multimodal.jpegStats(spark, Sf).orderBy("media_id").limit(40).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val wb = 1 + (id % 4).toInt; val hb = 1 + (id % 3).toInt
      val vals = (0 until wb * hb).map(k => ((id * 37 + k.toLong * 59) % 256).toInt)
      assert(r.getAs[Int]("width") == wb * 8, s"width doc $id")
      assert(r.getAs[Int]("height") == hb * 8, s"height doc $id")
      assert(r.getAs[Long]("n_pixels") == wb.toLong * hb * 64, s"n_pixels doc $id")
      assert(r.getAs[Long]("sum_gray") == 64L * vals.map(_.toLong).sum, s"sum doc $id")
      assert(r.getAs[Int]("peak") == vals.max, s"peak doc $id")
    }
    // slice covers the plain path, the DRI/RSTn restart path, AND the
    // progressive (SOF2) coding — all answering the same oracle
    assert(rows.exists(_.getAs[Long]("media_id") % 5 == 0))
    assert(rows.exists(_.getAs[Long]("media_id") % 5 != 0))
    assert(rows.exists(_.getAs[Long]("media_id") % 7 == 2))
    val prog = JpegPlant.encode(2L)
    assert(prog.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "docId%7==2 plants must be SOF2")
  }

  test("progressive plant with restarts (docId%35==30) decodes DC-exact") {
    // progressive + DRI: predictors AND EOB runs reset at RSTn in every scan
    Seq(30L, 65L, 2L, 9L, 16L).foreach { id =>
      val bytes = JpegPlant.encode(id)
      val (w, h, px) = JpegPixels.rgb(bytes)
      val wb = 1 + (id % 4).toInt; val hb = 1 + (id % 3).toInt
      assert(w == wb * 8 && h == hb * 8, s"doc $id dims")
      for (by <- 0 until hb; bx <- 0 until wb) {
        val expect = ((id * 37 + (by * wb + bx).toLong * 59) % 256).toInt
        val got = px((by * 8) * w + bx * 8) & 0xff
        assert(got == expect, s"doc $id block ($bx,$by): $got != $expect")
      }
    }
  }

  test("grayscale golden: our decode matches ImageIO's within ±1 per pixel") {
    // 13×9 forces partial edge blocks; pixel pattern has sharp structure
    val w = 13; val h = 9
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 83 + y * 131 + (x * y) % 7 * 40) % 256)
    val bytes = imageioJpeg(img)
    val (dw, dh, ours) = JpegPixels.rgb(bytes)
    assert(dw == w && dh == h)
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDelta = 0
    for (y <- 0 until h; x <- 0 until w) {
      val o = ours(y * w + x) & 0xff
      val t = theirs.getRaster.getSample(x, y, 0)
      maxDelta = math.max(maxDelta, math.abs(o - t))
    }
    assert(maxDelta <= 1, s"gray IDCT divergence $maxDelta > 1")
  }

  test("color golden: smooth-gradient RGB decode tracks ImageIO per channel") {
    val w = 32; val h = 24
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 40 + x * 4; val g = 200 - y * 5; val b = 30 + (x + y) * 3
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = imageioJpeg(img)
    val (dw, dh, ours) = JpegPixels.rgb(bytes)
    assert(dw == w && dh == h)
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sumAbs = 0L; var maxDelta = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val shift = 16 - 8 * c
      val o = (ours(y * w + x) >> shift) & 0xff
      val t = (theirs.getRGB(x, y) >> shift) & 0xff
      sumAbs += math.abs(o - t)
      maxDelta = math.max(maxDelta, math.abs(o - t))
    }
    // chroma upsampling strategies differ (box vs fancy); gradients keep
    // the divergence small and the mean tiny
    assert(maxDelta <= 12, s"color divergence $maxDelta > 12")
    assert(sumAbs.toDouble / (w * h * 3) <= 2.0, s"mean |delta| ${sumAbs.toDouble / (w * h * 3)}")
  }

  private def imageioProgressive(img: BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val out = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val bytes = out.toByteArray
    // make sure ImageIO really wrote SOF2 — the test is void otherwise
    assert(bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "encoder must emit a progressive (SOF2) stream")
    bytes
  }

  test("progressive grayscale golden: ImageIO SOF2 stream matches within ±1") {
    val w = 21; val h = 13 // partial edge blocks in both axes
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 61 + y * 149 + (x * y) % 5 * 37) % 256)
    val bytes = imageioProgressive(img)
    val (dw, dh, ours) = JpegPixels.rgb(bytes)
    assert(dw == w && dh == h)
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDelta = 0
    for (y <- 0 until h; x <- 0 until w) {
      val o = ours(y * w + x) & 0xff
      val t = theirs.getRaster.getSample(x, y, 0)
      maxDelta = math.max(maxDelta, math.abs(o - t))
    }
    assert(maxDelta <= 1, s"progressive gray divergence $maxDelta > 1")
  }

  test("progressive color golden: successive approximation + subsampling decode") {
    val w = 37; val h = 29
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // the SAME gradient the baseline color golden uses (divergence there
    // is pure box-vs-fancy upsampling; this pins progressive to match it)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 40 + x * 4; val g = 200 - y * 5; val b = 30 + (x + y) * 3
      img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
    }
    val bytes = imageioProgressive(img)
    val (dw, dh, ours) = JpegPixels.rgb(bytes)
    assert(dw == w && dh == h)
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sumAbs = 0L; var maxDelta = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val shift = 16 - 8 * c
      val o = (ours(y * w + x) >> shift) & 0xff
      val t = (theirs.getRGB(x, y) >> shift) & 0xff
      sumAbs += math.abs(o - t)
      maxDelta = math.max(maxDelta, math.abs(o - t))
    }
    assert(maxDelta <= 12, s"progressive color divergence $maxDelta > 12")
    assert(sumAbs.toDouble / (w * h * 3) <= 2.0,
      s"mean |delta| ${sumAbs.toDouble / (w * h * 3)}")
  }

  test("malformed streams yield in-struct nulls, never a throw") {
    import spark.implicits._
    val planted = JpegPlant.encode(7L)
    // patch SOF0 (FFC0) to SOF2 (FFC2) — progressive, unsupported
    val prog = planted.clone()
    var i = 0
    var patched = false
    while (i < prog.length - 1 && !patched) {
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) {
        prog(i + 1) = 0xc2.toByte; patched = true
      }
      i += 1
    }
    assert(patched)
    val rows = Seq(prog, "garbage".getBytes, planted.take(30)).toDF("content")
      .select(org.apache.spark.sql.GraftColumnShim.column(
        graft.plans.JpegPixels(
          org.apache.spark.sql.GraftColumnShim.expression(col("content")))).as("s"))
      .select("s.*").collect()
    rows.foreach(r => assert(r.isNullAt(r.fieldIndex("width"))))
  }

  test("huge claimed SOF dims are rejected before any plane allocation") {
    // ~200-byte blob claiming 65535x65535 must yield nulls instantly,
    // not a multi-GB allocation (untrusted-crawl DoS guard)
    val huge = JpegPlant.encode(3L).clone()
    var i = 0
    var patched = false
    while (i < huge.length - 8 && !patched) {
      if ((huge(i) & 0xff) == 0xff && (huge(i + 1) & 0xff) == 0xc0) {
        // FFC0 len(2) prec(1) then h(2) w(2)
        huge(i + 5) = 0xff.toByte; huge(i + 6) = 0xff.toByte
        huge(i + 7) = 0xff.toByte; huge(i + 8) = 0xff.toByte
        patched = true
      }
      i += 1
    }
    assert(patched)
    val r = graft.plans.JpegPixels.parse(huge)
    assert(r.isNullAt(0))
  }

  test("restart cadence resets DC prediction (docId%5==0 plants DRI)") {
    val withRst = JpegPlant.encode(10L) // 10 % 5 == 0 → DRI present
    assert({
      var found = false; var i = 0
      while (i < withRst.length - 1 && !found) {
        if ((withRst(i) & 0xff) == 0xff && (withRst(i + 1) & 0xff) == 0xdd) found = true
        i += 1
      }
      found
    }, "plant must carry a DRI segment")
    val (w, h, px) = JpegPixels.rgb(withRst)
    val wb = JpegPlant.widthBlocksOf(10L)
    for (k <- 0 until wb * JpegPlant.heightBlocksOf(10L)) {
      val v = JpegPlant.blockValOf(10L, k)
      val bx = (k % wb) * 8; val by = (k / wb) * 8
      assert((px(by * w + bx) & 0xff) == v, s"block $k decoded exactly")
    }
    assert(h % 8 == 0 && w % 8 == 0)
  }

  test("gated plan has no data shuffle — only the deliberate round-robin widen") {
    val plan = Multimodal.jpegStats(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"), "jpeg decode must not shuffle by key")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
  }
}
