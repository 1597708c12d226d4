package graft

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.apache.spark.sql.catalyst.InternalRow
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{GifPixels, GifPlant}

/** Golden tests: [[GifPixels]] must recover exact channel sums from GIFs
  * produced by the JDK's own ImageIO GIF writer (an independent LZW
  * implementation), across palette sizes, interlace, dictionary-growth
  * stress, and malformed input.
  */
class GifPixelsSpec extends AnyFunSuite {

  private def sums(img: BufferedImage): (Long, Long, Long, Int) = {
    var sr = 0L; var sg = 0L; var sb = 0L; var pk = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      sr += r; sg += g; sb += b
      pk = math.max(pk, math.max(r, math.max(g, b)))
    }
    (sr, sg, sb, pk)
  }

  private def decode(bytes: Array[Byte]): InternalRow = GifPixels.parse(bytes)

  private def assertMatches(bytes: Array[Byte], img: BufferedImage): Unit = {
    val row = decode(bytes)
    assert(!row.isNullAt(0), "decode returned nulls for a valid GIF")
    assert(row.getInt(0) == img.getWidth)
    assert(row.getInt(1) == img.getHeight)
    assert(row.getLong(3) == img.getWidth.toLong * img.getHeight)
    val (sr, sg, sb, pk) = sums(img)
    assert(row.getLong(4) == sr, "sum_r")
    assert(row.getLong(5) == sg, "sum_g")
    assert(row.getLong(6) == sb, "sum_b")
    assert(row.getInt(7) == pk, "peak")
  }

  test("plant round-trip: decode equals both the formula and ImageIO's own read") {
    Seq(0L, 1L, 2L, 7L, 41L, 123L, 1000003L).foreach { docId =>
      val bytes = GifPlant.encode(docId)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assertMatches(bytes, img)
      // and the formula the oracle states
      val w = GifPlant.widthOf(docId); val h = GifPlant.heightOf(docId)
      val p = GifPlant.paletteSizeOf(docId)
      var sr = 0L; var sg = 0L; var sb = 0L
      (0 until w * h).foreach { i =>
        val j = (docId + i) % p
        sr += (docId * 3 + 5 * j) % 256
        sg += (docId * 11 + 7 * j) % 256
        sb += (docId * 17 + 13 * j) % 256
      }
      val row = decode(bytes)
      assert(row.getLong(4) == sr && row.getLong(5) == sg && row.getLong(6) == sb,
        s"doc $docId: decoded sums disagree with the planted arithmetic")
    }
  }

  test("interlaced GIF decodes to identical stats (row order cannot matter)") {
    val docId = 55L
    val plain = GifPlant.encode(docId)
    // re-encode the same raster interlaced (GIF 'progressive' = interlace)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(plain))
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val interlaced = out.toByteArray
    assert(interlaced.length >= 14)
    val a = decode(plain)
    val b = decode(interlaced)
    assert(!b.isNullAt(0), "interlaced decode failed")
    Seq(0, 1).foreach(i => assert(a.getInt(i) == b.getInt(i)))
    Seq(3, 4, 5, 6).foreach(i => assert(a.getLong(i) == b.getLong(i),
      s"field $i differs between interlaced and sequential"))
    assert(a.getInt(7) == b.getInt(7))
  }

  test("dictionary growth + multi-sub-block stress: large varied raster") {
    // 211x149 with 256 palette colors forces 12-bit codes, mid-stream
    // CLEAR codes when the JDK encoder's table fills, and many >255-byte
    // sub-blocks
    val w = 211; val h = 149
    val rA = new Array[Byte](256); val gA = new Array[Byte](256); val bA = new Array[Byte](256)
    (0 until 256).foreach { j =>
      rA(j) = ((j * 7) % 256).toByte
      gA(j) = ((j * 13 + 5) % 256).toByte
      bA(j) = ((j * 31 + 11) % 256).toByte
    }
    val icm = new java.awt.image.IndexColorModel(8, 256, rA, gA, bA)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = img.getRaster
    (0 until w * h).foreach { i =>
      // varied but compressible-in-places pattern
      val v = if ((i / w) % 3 == 0) (i % 17) else ((i * 2654435761L) % 256).toInt
      raster.setSample(i % w, i / w, 0, v & 0xff)
    }
    val out = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    // non-interlaced: the JDK READER (our comparison oracle here) drops
    // rows of interlaced GIFs — see the interlace test for that path
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    assertMatches(out.toByteArray, img)
  }

  test("small palettes hit 3-bit and 4-bit starting code widths") {
    Seq(0L, 1L).foreach { docId => // palette 4 and 8
      val bytes = GifPlant.encode(docId)
      val row = decode(bytes)
      assert(!row.isNullAt(0))
    }
  }

  test("malformed input yields in-struct nulls, never throws") {
    val good = GifPlant.encode(9L)
    val cases = Seq(
      Array.empty[Byte],
      "GIF89a".getBytes,
      good.take(20),
      good.take(good.length * 2 / 3), // mid-LZW-stream truncation
      good.updated(0, 'X'.toByte),
      Array.fill[Byte](64)(0x2c)
    )
    cases.foreach { bad =>
      val row = decode(bad)
      assert(row.isNullAt(0) && row.isNullAt(4), "malformed input must null out")
    }
  }

  test("plant is deterministic") {
    assert(GifPlant.encode(77L).toSeq == GifPlant.encode(77L).toSeq)
  }
}
