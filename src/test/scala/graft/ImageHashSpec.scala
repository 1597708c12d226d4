package graft

import org.apache.spark.sql.functions._
import graft.plans.{PngDhash, PngPlant}
import graft.multimodal.ImageHash

class ImageHashSpec extends SparkSuite {

  /** Independent mirror: encode raster -> PNG via ImageIO, and compute
    * the expected dHash directly from the raster ints.
    */
  private def pngOf(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      im.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  private def bruteDhash(w: Int, h: Int, gw: Int, gh: Int,
      px: (Int, Int) => (Int, Int, Int)): Long = {
    val cols = gw + 1
    val sum = Array.ofDim[Long](gh, cols)
    val cnt = Array.ofDim[Long](gh, cols)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val gray = (299 * r + 587 * g + 114 * b) / 1000
      val c = (x.toLong * cols / w).toInt
      val rr = (y.toLong * gh / h).toInt
      sum(rr)(c) += gray; cnt(rr)(c) += 1
    }
    var hash = 0L
    for (r <- 0 until gh; c <- 0 until gw)
      if (sum(r)(c) / cnt(r)(c) > sum(r)(c + 1) / cnt(r)(c + 1))
        hash |= 1L << (r * gw + c)
    hash
  }

  private def f(x: Int, y: Int): (Int, Int, Int) =
    (((x * 7 + y * 13) % 256), ((x * 3 + y * 29 + 40) % 256), ((x * 11 + y) % 256))

  test("dhash equals the independent raster mirror at 8x8 on a 100x80 image") {
    val got = PngDhash.compute(pngOf(100, 80, f), 8, 8)
    assert(got != null && got.getLong(2) == bruteDhash(100, 80, 8, 8, f))
    assert(got.getInt(0) == 100 && got.getInt(1) == 80)
  }

  test("dhash equals the mirror at the gate grid on small odd dims") {
    for ((w, h) <- Seq((9, 4), (5, 11), (16, 14), (13, 7))) {
      val got = PngDhash.compute(pngOf(w, h, f), 4, 4)
      assert(got != null && got.getLong(2) == bruteDhash(w, h, 4, 4, f), s"${w}x$h")
    }
  }

  test("sub-grid images and malformed bytes yield null") {
    assert(PngDhash.compute(pngOf(4, 10, f), 4, 4) == null) // w < gw+1
    assert(PngDhash.compute(pngOf(10, 3, f), 4, 4) == null) // h < gh
    assert(PngDhash.compute(Array.fill[Byte](64)(7), 4, 4) == null)
    assert(PngDhash.compute(null, 4, 4) == null)
  }

  test("one-pixel gray nudge flips at most 2 bits (gradient locality)") {
    val base = bruteDhash(64, 64, 8, 8, f)
    def g(x: Int, y: Int): (Int, Int, Int) =
      if (x == 20 && y == 30) { val (r, gg, b) = f(x, y); ((r + 40) % 256, gg, b) }
      else f(x, y)
    val nudged = PngDhash.compute(pngOf(64, 64, g), 8, 8)
    assert(nudged != null)
    assert(java.lang.Long.bitCount(base ^ nudged.getLong(2)) <= 2)
  }

  test("plant dhash agrees with PngPlant bytes across all three layouts") {
    // covers RGB (%4 in {0,2}), palette (%4==1), 16-bit gray (%4==3)
    for (seed <- 1L to 24L) {
      val bytes = PngPlant.encode(seed)
      val got = PngDhash.compute(bytes, 4, 4)
      if (PngPlant.widthOf(seed) >= 5) assert(got != null, s"seed $seed")
      else assert(got == null, s"seed $seed")
    }
  }

  test("banded hamming join equals brute force on the planted fixture") {
    val dh = ImageHash.plantedDhash(spark, Sf, expr("doc_id DIV 2"))
      .persist()
    val banded = ImageHash.hammingPairs(dh).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rows = dh.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val brute = (for {
      (a, wa, hha, ha) <- rows; (b, wb, hhb, hb) <- rows
      if a < b && wa * 64 / hha == wb * 64 / hhb // the aspect-class key
      ham = java.lang.Long.bitCount(ha ^ hb).toLong
      if ham <= ImageHash.MaxHam
    } yield (a, b, ham)).toSet
    dh.unpersist()
    assert(banded == brute)
    assert(brute.exists(_._3 == 0L), "seed-paired identical images must appear")
  }

  // ---- resize invariance (X230): the aspect-class key's reason to exist ----

  import graft.plans.PngPlantCell

  test("cell plant twins hash identically at 1x, 2x and 3x resolution") {
    for (seed <- 1L to 12L) {
      val h1 = PngDhash.compute(PngPlantCell.encode(seed, 1, 8, 7), 8, 7)
      val h2 = PngDhash.compute(PngPlantCell.encode(seed, 2, 8, 7), 8, 7)
      val h3 = PngDhash.compute(PngPlantCell.encode(seed, 3, 8, 7), 8, 7)
      assert(h1 != null && h2 != null && h3 != null, s"seed $seed")
      assert(h1.getLong(2) == h2.getLong(2) && h2.getLong(2) == h3.getLong(2),
        s"seed $seed: per-cell content must be resolution-blind")
      assert(h1.getInt(0) == 9 && h2.getInt(0) == 18 && h3.getInt(0) == 27)
    }
  }

  test("a TRUE 2x box-downscale stays within the Hamming budget") {
    // not cell-aligned: the downscale is a real box reduce with floor
    // rounding, so bits MAY flip — the gate property is that a genuine
    // thumbnail lands within maxHam of its original, i.e. the pair
    // SURVIVES the banded join's verify step
    val (w, h) = (36, 28)
    val big = pngOf(w, h, f)
    def down(x: Int, y: Int): (Int, Int, Int) = {
      val ps = Seq(f(2 * x, 2 * y), f(2 * x + 1, 2 * y),
        f(2 * x, 2 * y + 1), f(2 * x + 1, 2 * y + 1))
      (ps.map(_._1).sum / 4, ps.map(_._2).sum / 4, ps.map(_._3).sum / 4)
    }
    val small = pngOf(w / 2, h / 2, down)
    val hb = PngDhash.compute(big, 8, 7)
    val hs = PngDhash.compute(small, 8, 7)
    assert(hb != null && hs != null)
    val ham = java.lang.Long.bitCount(hb.getLong(2) ^ hs.getLong(2))
    assert(ham <= ImageHash.MaxHam,
      s"2x thumbnail drifted $ham bits — rescale recall broken")
  }

  test("rescale pairs gate finds every cross-resolution twin at hamming 0") {
    val pairs = ImageHash.rescalePairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = spark.read.parquet(s"$Sf/documents.parquet").count()
    assert(pairs.length == docs.toInt, "exactly one pair per doc, no coincidences")
    assert(pairs.forall { case (a, b, ham) => b == a + 1 && a % 2 == 0 && ham == 0L })
  }

  // ---- JPEG / GIF fingerprints over the shared DhashCore ----

  import graft.plans.{GifDhash, GifPlant, JpegDhash, JpegPlant}

  test("jpeg dhash equals the closed-form block mirror on planted fixtures") {
    for (seed <- 1L to 24L) {
      val wb = JpegPlant.widthBlocksOf(seed)
      val w = wb * 8; val h = JpegPlant.heightBlocksOf(seed) * 8
      def px(x: Int, y: Int): (Int, Int, Int) = {
        val v = JpegPlant.blockValOf(seed, (y / 8) * wb + (x / 8))
        (v, v, v)
      }
      val got = JpegDhash.compute(JpegPlant.encode(seed), 4, 4)
      assert(got != null, s"seed $seed")
      assert(got.getInt(0) == w && got.getInt(1) == h, s"seed $seed dims")
      assert(got.getLong(2) == bruteDhash(w, h, 4, 4, px), s"seed $seed hash")
    }
  }

  test("gif dhash equals the palette mirror; width-4 plants are sub-grid null") {
    for (seed <- 1L to 24L) {
      val w = GifPlant.widthOf(seed); val h = GifPlant.heightOf(seed)
      val p = GifPlant.paletteSizeOf(seed)
      def px(x: Int, y: Int): (Int, Int, Int) = {
        val j = ((seed + (y.toLong * w + x)) % p).toInt
        (((seed * 3 + 5 * j) % 256).toInt, ((seed * 11 + 7 * j) % 256).toInt,
          ((seed * 17 + 13 * j) % 256).toInt)
      }
      val got = GifDhash.compute(GifPlant.encode(seed), 4, 4)
      if (w < 5) assert(got == null, s"seed $seed must reject sub-grid")
      else {
        assert(got != null, s"seed $seed")
        assert(got.getLong(2) == bruteDhash(w, h, 4, 4, px), s"seed $seed hash")
      }
    }
  }

  /** Encode an indexed raster as GIF, optionally interlaced. */
  private def gifOf(w: Int, h: Int, pal: Int, interlaced: Boolean,
      idx: (Int, Int) => Int): Array[Byte] = {
    val rA = Array.tabulate(pal)(j => ((5 * j + 3) % 256).toByte)
    val gA = Array.tabulate(pal)(j => ((7 * j + 11) % 256).toByte)
    val bA = Array.tabulate(pal)(j => ((13 * j + 17) % 256).toByte)
    val icm = new java.awt.image.IndexColorModel(8, pal, rA, gA, bA)
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w) im.getRaster.setSample(x, y, 0, idx(x, y))
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(
      if (interlaced) javax.imageio.ImageWriteParam.MODE_DEFAULT
      else javax.imageio.ImageWriteParam.MODE_DISABLED)
    writer.write(null, new javax.imageio.IIOImage(im, null, null), param)
    ios.close(); writer.dispose()
    out.toByteArray
  }

  test("interlaced GIF dhash equals the sequential encoding's (row remap)") {
    def idx(x: Int, y: Int): Int = (x * 3 + y * 7) % 16
    val seq = gifOf(20, 16, 16, interlaced = false, idx)
    val ilc = gifOf(20, 16, 16, interlaced = true, idx)
    assert(seq.toSeq != ilc.toSeq, "writer must actually interlace")
    val a = GifDhash.compute(seq, 4, 4)
    val b = GifDhash.compute(ilc, 4, 4)
    assert(a != null && b != null)
    assert(a.getLong(2) == b.getLong(2),
      "interlaced rows must land on their true raster positions")
  }

  test("identical raster fingerprints identically across PNG and GIF containers") {
    val pal = 16
    def idx(x: Int, y: Int): Int = (x + y * 5) % pal
    def rgb(x: Int, y: Int): (Int, Int, Int) = {
      val j = idx(x, y)
      ((5 * j + 3) % 256, (7 * j + 11) % 256, (13 * j + 17) % 256)
    }
    val p = graft.plans.PngDhash.compute(pngOf(14, 10, rgb), 4, 4)
    val g = GifDhash.compute(gifOf(14, 10, pal, interlaced = false, idx), 4, 4)
    assert(p != null && g != null)
    assert(p.getLong(2) == g.getLong(2), "one DhashCore, one fingerprint")
  }

  test("jpeg/gif dhash null paths: malformed bytes and null input") {
    assert(JpegDhash.compute(Array.fill[Byte](64)(3), 4, 4) == null)
    assert(JpegDhash.compute(null, 4, 4) == null)
    assert(GifDhash.compute(Array.fill[Byte](64)(3), 4, 4) == null)
    assert(GifDhash.compute(null, 4, 4) == null)
  }

  test("incremental keep equals the full-pair cross-check") {
    val seed = expr("CASE WHEN doc_id % 20 = 0 THEN doc_id + 1 ELSE doc_id END")
    val dh = ImageHash.plantedDhash(spark, Sf, seed).persist()
    val pairs = ImageHash.hammingPairs(dh).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = dh.select("media_id").collect().map(_.getLong(0)).toSet
    dh.unpersist()
    val batch = all.filter(_ % 10 == 0)
    val droppedRef = batch.filter(b => pairs.exists { case (x, y) =>
      (x == b && y % 10 != 0) || (y == b && x % 10 != 0)
    })
    val kept = ImageHash.incrementalKeep(spark, Sf)
      .collect().map(_.getLong(0)).toSet
    assert(kept == batch -- droppedRef)
    assert(kept.nonEmpty && droppedRef.nonEmpty, "both verdicts must be exercised")
  }
}
