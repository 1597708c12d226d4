package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructType}

/** Real PNG pixel decode — the image half of the multimodal decode
  * surface that used to be the documented stub. PNG needs no external
  * codec: the pixel stream is zlib-deflate (JDK `java.util.zip.Inflater`)
  * over per-scanline filtered samples, so a full standards-path decode —
  * signature, IHDR, IDAT concatenation, inflate, and all five PNG filter
  * reconstructions (None/Sub/Up/Average/Paeth, RFC 2083 §6) — is pure
  * JVM. What remains legitimately codec-bound (JPEG entropy decode,
  * video) keeps the declared stub.
  *
  * Output: (width, height, channels, n_pixels, sum_r, sum_g, sum_b,
  * sum_a, peak) — exact integers, the stats an image quality filter cuts
  * on first (mean brightness = sum DIV n downstream; peak = max sample).
  * Grayscale replicates its single channel into all three sums so the
  * brightness columns are format-independent; sum_a is null when the
  * color type carries no alpha. Supported shapes (round 9 widened):
  * gray/RGB/gray+alpha/RGBA at depths 8 AND 16 (16-bit samples project
  * to their high byte — the standard 16→8 downsample), and PALETTE
  * color (type 3) at depths 1/2/4/8 with PLTE lookup and per-index
  * tRNS alpha — the icon/screenshot shape a real crawl is full of —
  * plus ADAM7 INTERLACE (each pass decoded as its own filtered
  * sub-image; sums and peak are pixel-order independent, so no
  * deinterlace buffer is ever built — the GIF-interlace insight).
  * Malformed/truncated streams yield nulls INSIDE the struct — never a
  * null struct — so failure counts group cleanly.
  *
  * Scale: per-row, shuffle-free, stays inside whole-stage codegen via a
  * static call; one Inflater per ROW (not per partition) is deliberate —
  * the object is allocation-cheap, and a shared instance would make the
  * expression stateful and break codegen reuse. The decoded image is
  * materialized scanline-pair-wise (current + prior), never the full
  * pixel buffer, so memory is O(row bytes), not O(pixels).
  */
case class PngPixels(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"png_pixels requires binary, got $t")
    }

  override def dataType: DataType = PngPixels.Schema
  override def prettyName: String = "png_pixels"

  override def nullSafeEval(input: Any): Any =
    PngPixels.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PngPixels.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PngPixels {

  val Schema: StructType = new StructType()
    .add("width", IntegerType)
    .add("height", IntegerType)
    .add("channels", IntegerType)
    .add("n_pixels", LongType)
    .add("sum_r", LongType)
    .add("sum_g", LongType)
    .add("sum_b", LongType)
    .add("sum_a", LongType)
    .add("peak", IntegerType)

  private def nulls: InternalRow = {
    val r = new GenericInternalRow(9)
    var i = 0
    while (i < 9) { r.setNullAt(i); i += 1 }
    r
  }

  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private val Signature = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Static so generated code calls it directly. Never null, never throws. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 45) return nulls // sig+IHDR+IDAT hdr+IEND minimum
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != Signature(i)) return nulls; i += 1 }

    // IHDR is always the first chunk (PNG spec §11.2.2)
    if (be32(b, 8) != 13L || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return nulls
    val width = be32(b, 16)
    val height = be32(b, 20)
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    // samples per pixel; palette (3) is 1 index per pixel pre-lookup
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 3 => 1
      case 4 => 2
      case 6 => 4
      case _ => return nulls
    }
    // supported: depths 8/16 for gray/RGB/LA/RGBA; 1/2/4/8 for palette
    val depthOk =
      if (colorType == 3) bitDepth == 1 || bitDepth == 2 || bitDepth == 4 || bitDepth == 8
      else bitDepth == 8 || bitDepth == 16
    if (!depthOk || interlace > 1) return nulls
    if (width <= 0 || height <= 0 || width > (1 << 24) || height > (1 << 24)) return nulls
    val w = width.toInt
    val h = height.toInt

    // walk chunks: concatenate every IDAT payload (the zlib stream may
    // split at arbitrary byte boundaries across chunks — PNG spec §10),
    // and capture PLTE / tRNS for palette images
    var p = 33 // 8 sig + 25 IHDR chunk
    val n = b.length
    var idatLen = 0
    var plte: Array[Byte] = null
    var trns: Array[Byte] = null
    var at = p
    while (at >= 0 && at + 8 <= n) {
      val size = be32(b, at) // chunk: len(4) type(4) payload CRC(4)
      val avail = math.min(size, (n - at - 8).toLong).toInt
      if (b(at + 4) == 'I' && b(at + 5) == 'D' && b(at + 6) == 'A' && b(at + 7) == 'T')
        idatLen += avail
      else if (b(at + 4) == 'P' && b(at + 5) == 'L' && b(at + 6) == 'T' && b(at + 7) == 'E') {
        if (plte == null && avail > 0 && avail % 3 == 0 && avail <= 768)
          plte = java.util.Arrays.copyOfRange(b, at + 8, at + 8 + avail)
      } else if (b(at + 4) == 't' && b(at + 5) == 'R' && b(at + 6) == 'N' && b(at + 7) == 'S') {
        if (trns == null && avail > 0 && avail <= 256)
          trns = java.util.Arrays.copyOfRange(b, at + 8, at + 8 + avail)
      }
      val next = at.toLong + 12 + size
      at = if (next > n || next <= at) -1 else next.toInt
    }
    if (idatLen <= 0) return nulls
    if (colorType == 3 && plte == null) return nulls
    val nPal = if (plte == null) 0 else plte.length / 3
    val z = new Array[Byte](idatLen)
    var zp = 0
    at = p
    while (at >= 0 && at + 8 <= n) {
      val size = be32(b, at)
      if (b(at + 4) == 'I' && b(at + 5) == 'D' && b(at + 6) == 'A' && b(at + 7) == 'T') {
        val take = math.min(size, (n - at - 8).toLong).toInt
        if (take > 0) { System.arraycopy(b, at + 8, z, zp, take); zp += take }
      }
      val next = at.toLong + 12 + size
      at = if (next > n || next <= at) -1 else next.toInt
    }

    // inflate + unfilter scanline by scanline: memory stays O(2·rowBytes).
    // PNG filters operate on BYTES with the per-pixel byte distance bpp
    // (1 for sub-byte palette depths) regardless of sample layout.
    // Adam7 interlace needs NO deinterlace buffer here: the output is
    // channel sums + peak, which are pixel-order independent, and every
    // pixel appears in exactly one pass — each pass is just a smaller
    // sub-image with its own scanline filtering (prior resets per pass).
    val bpp = math.max(1, channels * bitDepth / 8)
    val lineBytes = (w * channels * bitDepth + 7) / 8
    val rowBytes = 1 + lineBytes
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(z, 0, zp)
    val raw = new Array[Byte](rowBytes) // filtered scanline as inflated
    val cur = new Array[Byte](lineBytes) // reconstructed current scanline
    val prior = new Array[Byte](lineBytes) // reconstructed previous scanline
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var sumA = 0L
    var peak = 0
    // Adam7 pass grid: (xStart, yStart, xStep, yStep)
    val passes: Array[Array[Int]] =
      if (interlace == 0) Array(Array(0, 0, 1, 1))
      else Array(Array(0, 0, 8, 8), Array(4, 0, 8, 8), Array(0, 4, 4, 8),
        Array(2, 0, 4, 4), Array(0, 2, 2, 4), Array(1, 0, 2, 2), Array(0, 1, 1, 2))
    try {
      var pi = 0
      while (pi < passes.length) {
        val xs = passes(pi)(0); val ys = passes(pi)(1)
        val xStep = passes(pi)(2); val yStep = passes(pi)(3)
        val wp = if (w > xs) (w - xs + xStep - 1) / xStep else 0
        val hp = if (h > ys) (h - ys + yStep - 1) / yStep else 0
        val lineBytesP = (wp * channels * bitDepth + 7) / 8
        val rowBytesP = 1 + lineBytesP
        if (wp > 0 && hp > 0) {
      var y = 0
      while (y < hp) {
        // fill one full scanline (Inflater may return partial reads)
        var got = 0
        while (got < rowBytesP) {
          val k = inflater.inflate(raw, got, rowBytesP - got)
          if (k == 0) {
            if (inflater.finished() || inflater.needsDictionary()) return nulls
            if (inflater.needsInput()) return nulls // truncated stream
          }
          got += k
        }
        val filter = raw(0) & 0xff
        var x = 0
        while (x < lineBytesP) {
          val rw = raw(1 + x) & 0xff
          val a = if (x >= bpp) cur(x - bpp) & 0xff else 0 // left
          val up = if (y > 0) prior(x) & 0xff else 0 // above
          val c = if (x >= bpp && y > 0) prior(x - bpp) & 0xff else 0 // upper-left
          val recon = filter match {
            case 0 => rw
            case 1 => (rw + a) & 0xff
            case 2 => (rw + up) & 0xff
            case 3 => (rw + ((a + up) >> 1)) & 0xff
            case 4 =>
              val pp = a + up - c
              val pa = math.abs(pp - a); val pb = math.abs(pp - up); val pc = math.abs(pp - c)
              val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
              (rw + pred) & 0xff
            case _ => return nulls
          }
          cur(x) = recon.toByte
          x += 1
        }

        // accumulate this scanline's samples per color layout
        if (colorType == 3) {
          // palette: unpack indices, look up PLTE; tRNS gives per-index
          // alpha (opaque past its end, per the spec)
          val perByte = 8 / bitDepth
          val mask = (1 << bitDepth) - 1
          var px = 0
          while (px < wp) {
            val byteIdx = px / perByte
            val shift = 8 - bitDepth * (px % perByte + 1)
            val idx = (cur(byteIdx) >> shift) & mask
            if (idx >= nPal) return nulls
            val pr = plte(3 * idx) & 0xff
            val pg = plte(3 * idx + 1) & 0xff
            val pb2 = plte(3 * idx + 2) & 0xff
            sumR += pr; sumG += pg; sumB += pb2
            if (pr > peak) peak = pr
            if (pg > peak) peak = pg
            if (pb2 > peak) peak = pb2
            if (trns != null) {
              val al = if (idx < trns.length) trns(idx) & 0xff else 255
              sumA += al
              if (al > peak) peak = al
            }
            px += 1
          }
        } else if (bitDepth == 16) {
          // 16-bit samples: the high byte is the 8-bit projection (the
          // standard 16→8 downsample); stats stay in the 8-bit domain
          var s = 0
          val nSamp = wp * channels
          while (s < nSamp) {
            val v = cur(2 * s) & 0xff
            if (v > peak) peak = v
            colorType match {
              case 0 => sumR += v; sumG += v; sumB += v
              case 2 => (s % 3) match {
                case 0 => sumR += v
                case 1 => sumG += v
                case _ => sumB += v
              }
              case 4 => if (s % 2 == 0) { sumR += v; sumG += v; sumB += v }
                else sumA += v
              case _ => (s % 4) match { // 6 = RGBA
                case 0 => sumR += v
                case 1 => sumG += v
                case 2 => sumB += v
                case _ => sumA += v
              }
            }
            s += 1
          }
        } else {
          var x = 0
          while (x < lineBytesP) {
            val recon = cur(x) & 0xff
            if (recon > peak) peak = recon
            colorType match {
              case 0 => // gray: replicate into all three brightness sums
                sumR += recon; sumG += recon; sumB += recon
              case 2 => (x % 3) match {
                case 0 => sumR += recon
                case 1 => sumG += recon
                case _ => sumB += recon
              }
              case 4 => if (x % 2 == 0) { sumR += recon; sumG += recon; sumB += recon }
                else sumA += recon
              case _ => (x % 4) match { // 6 = RGBA
                case 0 => sumR += recon
                case 1 => sumG += recon
                case 2 => sumB += recon
                case _ => sumA += recon
              }
            }
            x += 1
          }
        }
        System.arraycopy(cur, 0, prior, 0, lineBytesP)
        y += 1
      }
        } // pass non-empty
        pi += 1
      }
    } catch {
      case _: java.util.zip.DataFormatException => return nulls
    } finally {
      inflater.end()
    }

    val hasAlpha = colorType == 4 || colorType == 6 || (colorType == 3 && trns != null)
    // palette pixels REPORT as RGB triples (what the lookup emits)
    val outChannels = if (colorType == 3) (if (trns != null) 4 else 3) else channels
    val r = new GenericInternalRow(9)
    r.setInt(0, w); r.setInt(1, h); r.setInt(2, outChannels)
    r.setLong(3, w.toLong * h)
    r.setLong(4, sumR); r.setLong(5, sumG); r.setLong(6, sumB)
    if (hasAlpha) r.setLong(7, sumA) else r.setNullAt(7)
    r.setInt(8, peak)
    r
  }
}
