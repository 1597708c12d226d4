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

  /** Per-pixel visitor for [[walk]]. `a` is -1 when the color layout
    * carries no alpha (gray / RGB / palette without tRNS); 16-bit
    * samples arrive as their high byte (the standard 16→8 downsample).
    * Coordinates are TRUE image-plane (x, y) — Adam7 pass-grid
    * positions are mapped back — so position-dependent consumers
    * (the dHash grid) and position-free ones (channel stats) share
    * one decode core.
    */
  trait RgbSink {
    def pixel(x: Int, y: Int, r: Int, g: Int, bl: Int, a: Int): Unit
  }

  /** Header facts the stats consumer needs after the pixel walk. */
  final class Info(val w: Int, val h: Int, val colorType: Int, val hasTrns: Boolean)

  /** The shared standards-path decode: signature → IHDR → PLTE/tRNS →
    * IDAT concatenation → inflate → all five filter reconstructions,
    * emitting every pixel into `sink`. Returns null on any malformed /
    * truncated / unsupported stream (the caller maps that to its own
    * null shape). Memory stays O(2·rowBytes): scanline pair only,
    * never a full pixel buffer.
    */
  def walk(b: Array[Byte], sink: RgbSink): Info = {
    if (b == null || b.length < 45) return null // sig+IHDR+IDAT hdr+IEND minimum
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != Signature(i)) return null; i += 1 }

    // IHDR is always the first chunk (PNG spec §11.2.2)
    if (be32(b, 8) != 13L || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return null
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
      case _ => return null
    }
    // supported: depths 8/16 for gray/RGB/LA/RGBA; 1/2/4/8 for palette
    val depthOk =
      if (colorType == 3) bitDepth == 1 || bitDepth == 2 || bitDepth == 4 || bitDepth == 8
      else bitDepth == 8 || bitDepth == 16
    if (!depthOk || interlace > 1) return null
    if (width <= 0 || height <= 0 || width > (1 << 24) || height > (1 << 24)) return null
    val w = width.toInt
    val h = height.toInt

    // walk chunks: concatenate every IDAT payload (the zlib stream may
    // split at arbitrary byte boundaries across chunks — PNG spec §10),
    // and capture PLTE / tRNS for palette images
    val p = 33 // 8 sig + 25 IHDR chunk
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
    if (idatLen <= 0) return null
    if (colorType == 3 && plte == null) return null
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
    // Adam7 interlace needs NO deinterlace buffer: every pixel appears in
    // exactly one pass — each pass is a smaller sub-image with its own
    // scanline filtering (prior resets per pass) — and the sink receives
    // image-plane coordinates, so consumers never see pass order.
    val bpp = math.max(1, channels * bitDepth / 8)
    val lineBytes = (w * channels * bitDepth + 7) / 8
    val rowBytes = 1 + lineBytes
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(z, 0, zp)
    val raw = new Array[Byte](rowBytes) // filtered scanline as inflated
    val cur = new Array[Byte](lineBytes) // reconstructed current scanline
    val prior = new Array[Byte](lineBytes) // reconstructed previous scanline
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
                if (inflater.finished() || inflater.needsDictionary()) return null
                if (inflater.needsInput()) return null // truncated stream
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
                case _ => return null
              }
              cur(x) = recon.toByte
              x += 1
            }

            // emit this scanline's pixels at image-plane coordinates
            val py = ys + y * yStep
            if (colorType == 3) {
              // palette: unpack indices, look up PLTE; tRNS gives
              // per-index alpha (opaque past its end, per the spec)
              val perByte = 8 / bitDepth
              val mask = (1 << bitDepth) - 1
              var px = 0
              while (px < wp) {
                val byteIdx = px / perByte
                val shift = 8 - bitDepth * (px % perByte + 1)
                val idx = (cur(byteIdx) >> shift) & mask
                if (idx >= nPal) return null
                val al =
                  if (trns != null) { if (idx < trns.length) trns(idx) & 0xff else 255 }
                  else -1
                sink.pixel(xs + px * xStep, py,
                  plte(3 * idx) & 0xff, plte(3 * idx + 1) & 0xff,
                  plte(3 * idx + 2) & 0xff, al)
                px += 1
              }
            } else {
              // 8-bit samples sit at consecutive bytes; 16-bit samples
              // project to their HIGH byte (standard 16→8 downsample)
              val step = if (bitDepth == 16) 2 else 1
              var px = 0
              while (px < wp) {
                val base = px * channels * step
                val ix = xs + px * xStep
                colorType match {
                  case 0 =>
                    val v = cur(base) & 0xff
                    sink.pixel(ix, py, v, v, v, -1)
                  case 2 =>
                    sink.pixel(ix, py, cur(base) & 0xff, cur(base + step) & 0xff,
                      cur(base + 2 * step) & 0xff, -1)
                  case 4 =>
                    val v = cur(base) & 0xff
                    sink.pixel(ix, py, v, v, v, cur(base + step) & 0xff)
                  case _ => // 6 = RGBA
                    sink.pixel(ix, py, cur(base) & 0xff, cur(base + step) & 0xff,
                      cur(base + 2 * step) & 0xff, cur(base + 3 * step) & 0xff)
                }
                px += 1
              }
            }
            System.arraycopy(cur, 0, prior, 0, lineBytesP)
            y += 1
          }
        } // pass non-empty
        pi += 1
      }
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally {
      inflater.end()
    }
    new Info(w, h, colorType, trns != null)
  }

  /** Channel-stats sink: the original q_multimodal_pixels consumer. */
  private final class StatsSink extends RgbSink {
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var sumA = 0L
    var peak = 0
    def pixel(x: Int, y: Int, r: Int, g: Int, bl: Int, a: Int): Unit = {
      sumR += r; sumG += g; sumB += bl
      if (r > peak) peak = r
      if (g > peak) peak = g
      if (bl > peak) peak = bl
      if (a >= 0) { sumA += a; if (a > peak) peak = a }
    }
  }

  /** Static so generated code calls it directly. Never null, never throws. */
  def parse(b: Array[Byte]): InternalRow = {
    val s = new StatsSink
    val info = walk(b, s)
    if (info == null) return nulls
    val hasAlpha = info.colorType == 4 || info.colorType == 6 ||
      (info.colorType == 3 && info.hasTrns)
    // palette pixels REPORT as RGB triples (what the lookup emits)
    val outChannels = info.colorType match {
      case 0 => 1
      case 2 => 3
      case 3 => if (info.hasTrns) 4 else 3
      case 4 => 2
      case _ => 4
    }
    val r = new GenericInternalRow(9)
    r.setInt(0, info.w); r.setInt(1, info.h); r.setInt(2, outChannels)
    r.setLong(3, info.w.toLong * info.h)
    r.setLong(4, s.sumR); r.setLong(5, s.sumG); r.setLong(6, s.sumB)
    if (hasAlpha) r.setLong(7, s.sumA) else r.setNullAt(7)
    r.setInt(8, s.peak)
    r
  }
}
