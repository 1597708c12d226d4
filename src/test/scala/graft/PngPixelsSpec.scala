package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{PngPixels, PngPlant}

/** Golden round-trips for the PNG pixel decoder: the JDK's ImageIO
  * encoder (independent filter heuristics + its own Deflater) writes,
  * [[PngPixels]] must read back the exact planted arithmetic — across
  * RGB / grayscale / RGBA color types, a hand-split multi-IDAT stream,
  * and malformed inputs. The oracle gate (`q_multimodal_pixels`) pins
  * the RGB path cross-engine; this spec pins the color types and
  * byte-level shapes the RGB plant can't reach.
  */
class PngPixelsSpec extends AnyFunSuite {

  private def statsOf(b: Array[Byte]) = PngPixels.parse(b)

  test("RGB plant round-trips exactly for a spread of doc_ids") {
    // %4 ∈ {0,2} stay truecolor; %4==1/3 route to palette / 16-bit plants
    for (docId <- Seq(0L, 4L, 6L, 10L, 12L, 58L, 998L, 123456L)) {
      val w = PngPlant.widthOf(docId)
      val h = PngPlant.heightOf(docId)
      var sr = 0L; var sg = 0L; var sb = 0L; var pk = 0
      for (i <- 0L until w.toLong * h) {
        val r = ((docId + 3 * i) % 256).toInt
        val g = ((docId * 7 + 5 * i) % 256).toInt
        val b = ((docId * 13 + 11 * i) % 256).toInt
        sr += r; sg += g; sb += b
        pk = math.max(pk, math.max(r, math.max(g, b)))
      }
      val row = statsOf(PngPlant.encode(docId))
      assert(!row.isNullAt(0), s"doc $docId failed to decode")
      assert(row.getInt(0) === w && row.getInt(1) === h, s"doc $docId dims")
      assert(row.getInt(2) === 3)
      assert(row.getLong(3) === w.toLong * h)
      assert(row.getLong(4) === sr && row.getLong(5) === sg && row.getLong(6) === sb,
        s"doc $docId channel sums")
      assert(row.isNullAt(7), "RGB must carry no alpha sum")
      assert(row.getInt(8) === pk, s"doc $docId peak")
    }
  }

  private def encodeAwt(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("grayscale (color type 0): single channel replicated into all three brightness sums") {
    val w = 9; val h = 6
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var sum = 0L; var pk = 0
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 29 + y * 53) % 256
      raster.setSample(x, y, 0, v)
      sum += v; pk = math.max(pk, v)
    }
    val row = statsOf(encodeAwt(img))
    assert(row.getInt(2) === 1)
    assert(row.getLong(4) === sum && row.getLong(5) === sum && row.getLong(6) === sum)
    assert(row.isNullAt(7))
    assert(row.getInt(8) === pk)
  }

  test("RGBA (color type 6): four channels, alpha summed separately") {
    val w = 7; val h = 5
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L; var pk = 0
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 31) % 256; val g = (y * 41) % 256
      val b = (x * 7 + y * 11) % 256; val a = 255 - ((x + y) * 13) % 97
      img.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
      sr += r; sg += g; sb += b; sa += a
      pk = math.max(pk, math.max(math.max(r, g), math.max(b, a)))
    }
    val row = statsOf(encodeAwt(img))
    assert(row.getInt(2) === 4)
    assert(row.getLong(4) === sr && row.getLong(5) === sg && row.getLong(6) === sb)
    assert(row.getLong(7) === sa)
    assert(row.getInt(8) === pk)
  }

  test("a split IDAT stream decodes identically (zlib data crosses chunk boundaries)") {
    val whole = PngPlant.encode(59L)
    // locate the first IDAT chunk
    def be32(b: Array[Byte], p: Int): Int =
      ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
    var at = 8
    while (!(whole(at + 4) == 'I' && whole(at + 5) == 'D' &&
      whole(at + 6) == 'A' && whole(at + 7) == 'T')) at += 12 + be32(whole, at)
    val len = be32(whole, at)
    assert(len > 4, "fixture IDAT too small to split")
    val half = len / 2
    val out = new java.io.ByteArrayOutputStream()
    out.write(whole, 0, at)
    def chunk(payload: Array[Byte], from: Int, n: Int): Unit = {
      out.write(Array[Byte]((n >>> 24).toByte, (n >>> 16).toByte, (n >>> 8).toByte, n.toByte))
      out.write('I'); out.write('D'); out.write('A'); out.write('T')
      out.write(payload, from, n)
      out.write(Array[Byte](0, 0, 0, 0)) // CRC unvalidated by the stats parser
    }
    chunk(whole, at + 8, half)
    chunk(whole, at + 8 + half, len - half)
    val rest = at + 12 + len
    out.write(whole, rest, whole.length - rest)
    val reassembled = out.toByteArray
    val a = statsOf(whole); val b = statsOf(reassembled)
    for (i <- 0 until 9) {
      assert(a.isNullAt(i) === b.isNullAt(i))
      if (!a.isNullAt(i) && i != 3 && i != 4 && i != 5 && i != 6)
        assert(a.getInt(i) === b.getInt(i), s"field $i")
      if (!a.isNullAt(i) && (i == 3 || i == 4 || i == 5 || i == 6))
        assert(a.getLong(i) === b.getLong(i), s"field $i")
    }
  }

  test("palette plant (color type 3, PLTE lookup) round-trips exactly") {
    for (docId <- Seq(1L, 5L, 13L, 57L, 141L, 123457L)) {
      val bytes = PngPlant.encode(docId)
      assert((bytes(25) & 0xff) == 3, s"doc $docId must encode as palette PNG")
      val w = PngPlant.widthOf(docId)
      val h = PngPlant.heightOf(docId)
      var sr = 0L; var sg = 0L; var sb = 0L; var pk = 0
      for (i <- 0L until w.toLong * h) {
        val j = ((docId + i) % 16).toInt
        val r = ((docId + 17 * j) % 256).toInt
        val g = ((docId * 7 + 23 * j) % 256).toInt
        val b = ((docId * 13 + 29 * j) % 256).toInt
        sr += r; sg += g; sb += b
        pk = math.max(pk, math.max(r, math.max(g, b)))
      }
      val row = statsOf(bytes)
      assert(!row.isNullAt(0), s"doc $docId failed to decode")
      assert(row.getInt(2) === 3, "palette without tRNS reports RGB")
      assert(row.getLong(4) === sr && row.getLong(5) === sg && row.getLong(6) === sb,
        s"doc $docId palette sums")
      assert(row.isNullAt(7))
      assert(row.getInt(8) === pk, s"doc $docId peak")
    }
  }

  test("16-bit grayscale plant projects samples to their high byte") {
    for (docId <- Seq(3L, 7L, 59L, 143L, 999L)) {
      val bytes = PngPlant.encode(docId)
      assert((bytes(24) & 0xff) == 16 && (bytes(25) & 0xff) == 0,
        s"doc $docId must encode 16-bit grayscale")
      val w = PngPlant.widthOf(docId)
      val h = PngPlant.heightOf(docId)
      var s = 0L; var pk = 0
      for (i <- 0L until w.toLong * h) {
        val v = (((docId * 31 + 257 * i) % 65536) / 256).toInt
        s += v; pk = math.max(pk, v)
      }
      val row = statsOf(bytes)
      assert(!row.isNullAt(0), s"doc $docId failed to decode")
      assert(row.getInt(2) === 1)
      assert(row.getLong(4) === s && row.getLong(5) === s && row.getLong(6) === s,
        s"doc $docId gray16 sums")
      assert(row.getInt(8) === pk, s"doc $docId peak")
    }
  }

  test("tRNS on a palette image: per-index alpha, opaque past the table end") {
    // hand-built type-3 PNG: 4x2, depth 8, 4-entry PLTE, 2-entry tRNS
    // (indices 2 and 3 are opaque by omission); our parser skips CRCs
    def chunk(tag: String, payload: Array[Int]): Array[Byte] = {
      val len = payload.length
      (Array(len >> 24, len >> 16, len >> 8, len & 0xff).map(_ & 0xff) ++
        tag.getBytes.map(_ & 0xff) ++ payload ++ Array(0, 0, 0, 0)).map(_.toByte)
    }
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = chunk("IHDR", Array(0, 0, 0, 4, 0, 0, 0, 2, 8, 3, 0, 0, 0))
    val plte = chunk("PLTE", Array(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120))
    val trns = chunk("tRNS", Array(128, 200))
    val rows = Array[Byte](0, 0, 1, 2, 3, 0, 3, 2, 1, 0) // filter 0 + indices
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(rows); deflater.finish()
    val zbuf = new Array[Byte](64)
    val zlen = deflater.deflate(zbuf)
    deflater.end()
    val idat = chunk("IDAT", zbuf.take(zlen).map(_ & 0xff))
    val png = sig ++ ihdr ++ plte ++ trns ++ idat ++ chunk("IEND", Array())
    val row = statsOf(png)
    assert(!row.isNullAt(0), "hand-built palette PNG must decode")
    assert(row.getInt(2) === 4, "palette WITH tRNS reports RGBA")
    // row0 = 0,1,2,3  row1 = 3,2,1,0 → each index appears twice
    assert(row.getLong(3) === 8L)
    assert(row.getLong(4) === 2L * (10 + 40 + 70 + 100), "sum_r")
    assert(row.getLong(5) === 2L * (20 + 50 + 80 + 110), "sum_g")
    assert(row.getLong(6) === 2L * (30 + 60 + 90 + 120), "sum_b")
    // alpha: idx0→128, idx1→200, idx2/3→opaque 255
    assert(row.getLong(7) === 2L * (128 + 200 + 255 + 255), "sum_a")
    assert(row.getInt(8) === 255, "peak includes the implicit opaque alpha")
  }

  test("Adam7 interlace: per-pass filtered sub-images accumulate the same stats") {
    // %8==2 plants are ImageIO-progressive (Adam7); the pixel formula and
    // the expected sums are IDENTICAL to the sequential RGB case
    for (docId <- Seq(2L, 10L, 58L, 122L)) {
      val bytes = PngPlant.encode(docId)
      assert((bytes(28) & 0xff) == 1, s"doc $docId must encode interlaced")
      val w = PngPlant.widthOf(docId)
      val h = PngPlant.heightOf(docId)
      var sr = 0L; var sg = 0L; var sb = 0L; var pk = 0
      for (i <- 0L until w.toLong * h) {
        val r = ((docId + 3 * i) % 256).toInt
        val g = ((docId * 7 + 5 * i) % 256).toInt
        val b = ((docId * 13 + 11 * i) % 256).toInt
        sr += r; sg += g; sb += b
        pk = math.max(pk, math.max(r, math.max(g, b)))
      }
      val row = statsOf(bytes)
      assert(!row.isNullAt(0), s"doc $docId failed to decode")
      assert(row.getLong(4) === sr && row.getLong(5) === sg && row.getLong(6) === sb,
        s"doc $docId interlaced sums")
      assert(row.getInt(8) === pk, s"doc $docId peak")
    }
    // 1-pixel-wide/tall images leave several Adam7 passes EMPTY
    for ((w, h) <- Seq((1, 9), (9, 1), (2, 2))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, 0x405060)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      val row = statsOf(out.toByteArray)
      assert(!row.isNullAt(0), s"${w}x$h interlaced failed")
      assert(row.getLong(4) === 0x40L * w * h, s"${w}x$h sum_r")
      assert(row.getLong(6) === 0x60L * w * h, s"${w}x$h sum_b")
    }
  }

  test("Adam7 property: random rasters give IDENTICAL stats interlaced vs sequential") {
    val rnd = new scala.util.Random(123)
    def png(img: java.awt.image.BufferedImage, interlaced: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      if (interlaced) {
        val w = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
        val p = w.getDefaultWriteParam
        p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
        val ios = javax.imageio.ImageIO.createImageOutputStream(out)
        w.setOutput(ios)
        w.write(null, new javax.imageio.IIOImage(img, null, null), p)
        ios.close(); w.dispose()
      } else javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    for (_ <- 1 to 12) {
      val w = 1 + rnd.nextInt(24); val h = 1 + rnd.nextInt(24)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rnd.nextInt(1 << 24))
      val a = statsOf(png(img, interlaced = false))
      val b = statsOf(png(img, interlaced = true))
      assert(!a.isNullAt(0) && !b.isNullAt(0), s"${w}x$h failed to decode")
      (0 until 9).foreach { i =>
        if (i == 7) assert(a.isNullAt(7) && b.isNullAt(7)) // RGB: no alpha
        else if (i <= 2 || i == 8)
          assert(a.getInt(i) == b.getInt(i), s"${w}x$h field $i")
        else assert(a.getLong(i) == b.getLong(i), s"${w}x$h field $i")
      }
    }
  }

  test("malformed and unsupported inputs yield in-struct nulls, never a throw") {
    val truncated = PngPlant.encode(7L).take(40) // signature + IHDR, no pixel data
    val garbage = Array.fill[Byte](64)(0x5a)
    val empty = Array.emptyByteArray
    for (bad <- Seq(truncated, garbage, empty, null)) {
      val row = statsOf(bad)
      for (i <- 0 until 9) assert(row.isNullAt(i))
    }
  }
}
