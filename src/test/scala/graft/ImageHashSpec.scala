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
      if a < b && wa == wb && hha == hhb
      ham = java.lang.Long.bitCount(ha ^ hb).toLong
      if ham <= ImageHash.MaxHam
    } yield (a, b, ham)).toSet
    dh.unpersist()
    assert(banded == brute)
    assert(brute.exists(_._3 == 0L), "seed-paired identical images must appear")
  }
}
