package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructType}

/** Real GIF pixel decode — the second image format of the multimodal
  * surface made real, and like PNG it needs no external codec: GIF's
  * only compression is LZW with GIF's variable-width code packing
  * (LSB-first, 3–12 bits, dictionary capped at 4096 entries, CLEAR/END
  * control codes — GIF89a spec appendix F), implementable exactly on the
  * JVM. The walk: header → logical screen descriptor → global color
  * table → extension blocks (skipped by sub-block framing, so GCE /
  * comment / application extensions of any content pass through) → first
  * image descriptor → local color table override → LZW stream across
  * data sub-blocks → palette-mapped channel stats.
  *
  * Output: (width, height, palette_size, n_pixels, sum_r, sum_g, sum_b,
  * peak) — the same exact-integer brightness stats as [[PngPixels]], so
  * the downstream image-quality filter is format-independent. Interlaced
  * images decode WITHOUT a deinterlace pass: the four-pass row
  * permutation reorders rows only, and sums/extrema are
  * order-independent — the stats path skips the buffer a full decoder
  * would need. Malformed input (bad signature, missing color table,
  * code overflow, truncated stream, short pixel count) yields nulls
  * INSIDE the struct, never a null struct.
  *
  * Scale: per-row, shuffle-free, static-call codegen. Memory is O(4096)
  * dictionary arrays + O(1) accumulators — the decoded image is never
  * materialized (pixels stream through the accumulator as LZW strings
  * unwind), so arbitrarily large frames cost no buffer.
  */
case class GifPixels(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"gif_pixels requires binary, got $t")
    }

  override def dataType: DataType = GifPixels.Schema
  override def prettyName: String = "gif_pixels"

  override def nullSafeEval(input: Any): Any =
    GifPixels.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GifPixels.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GifPixels {

  val Schema: StructType = new StructType()
    .add("width", IntegerType)
    .add("height", IntegerType)
    .add("palette_size", IntegerType)
    .add("n_pixels", LongType)
    .add("sum_r", LongType)
    .add("sum_g", LongType)
    .add("sum_b", LongType)
    .add("peak", IntegerType)

  private def nulls: InternalRow = {
    val r = new GenericInternalRow(8)
    var i = 0
    while (i < 8) { r.setNullAt(i); i += 1 }
    r
  }

  /** Header scan up to the first image frame: signature → logical
    * screen → color tables → extension skip → image descriptor.
    * Returns `[w, h, ctOff, ctSize, minCode, dataPos, interlace]`, or
    * null on malformed framing — the one copy [[parse]] and [[walk]]
    * share.
    */
  private def frame(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 14) return null
    if (b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
        !(b(4) == '7' || b(4) == '9') || b(5) != 'a') return null
    def le16(p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

    val screenPacked = b(10) & 0xff
    var p = 13
    var gctOff = -1
    var gctSize = 0
    if ((screenPacked & 0x80) != 0) {
      gctSize = 1 << ((screenPacked & 7) + 1)
      gctOff = p
      p += 3 * gctSize
      if (p > b.length) return null
    }

    while (p < b.length) {
      (b(p) & 0xff) match {
        case 0x3b => return null // trailer before any image frame
        case 0x21 => // extension: label + sub-blocks, content-agnostic skip
          p += 2
          while (p < b.length && (b(p) & 0xff) != 0) p += 1 + (b(p) & 0xff)
          if (p >= b.length) return null
          p += 1
        case 0x2c => // image descriptor: the frame we decode
          if (p + 10 > b.length) return null
          val w = le16(p + 5)
          val h = le16(p + 7)
          val imgPacked = b(p + 9) & 0xff
          p += 10
          var ctOff = gctOff
          var ctSize = gctSize
          if ((imgPacked & 0x80) != 0) { // local color table overrides
            ctSize = 1 << ((imgPacked & 7) + 1)
            ctOff = p
            p += 3 * ctSize
          }
          if (ctOff < 0 || ctOff + 3 * ctSize > b.length) return null
          if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15)) return null
          if (p >= b.length) return null
          val minCode = b(p) & 0xff
          p += 1
          if (minCode < 2 || minCode > 11) return null
          return Array(w, h, ctOff, ctSize, minCode, p,
            if ((imgPacked & 0x40) != 0) 1 else 0)
        case _ => return null
      }
    }
    null
  }

  /** Channel-stats sink: the original q_multimodal_gif consumer. */
  private final class StatsSink extends PngPixels.RgbSink {
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var peak = 0
    def pixel(x: Int, y: Int, r: Int, g: Int, bl: Int, a: Int): Unit = {
      sumR += r; sumG += g; sumB += bl
      if (r > peak) peak = r
      if (g > peak) peak = g
      if (bl > peak) peak = bl
    }
  }

  /** Static so generated code calls it directly. Never null, never throws. */
  def parse(b: Array[Byte]): InternalRow = {
    val f = frame(b)
    if (f == null) return nulls
    val sink = new StatsSink
    if (!decodeLzw(b, f(5), f(4), f(0), f(1), f(2), f(3), sink)) return nulls
    val r = new GenericInternalRow(8)
    r.setInt(0, f(0)); r.setInt(1, f(1)); r.setInt(2, f(3))
    r.setLong(3, f(0).toLong * f(1))
    r.setLong(4, sink.sumR); r.setLong(5, sink.sumG); r.setLong(6, sink.sumB)
    r.setInt(7, sink.peak)
    r
  }

  /** Shared-visitor pixel walk (the [[PngPixels.walk]] twin): header
    * scan then the LZW stream, every palette-mapped pixel emitted with
    * its TRUE raster position into the sink built by
    * `mk(w, h, paletteSize)` — null sink = caller reject, no decode
    * work spent. Interlaced frames route each stream row through the
    * GIF89a four-pass permutation (rows 0,8,… then 4,12,… then 2,6,…
    * then odd), so position-sensitive consumers (the dHash grid) see
    * the actual raster — the stats path never needed this, a
    * fingerprint does. Returns `(w << 32) | h`, −1 on malformed input.
    * Alpha is −1 (the single decoded frame carries no transparency
    * handling — stats and fingerprints ignore it alike).
    */
  def walk(b: Array[Byte], mk: (Int, Int, Int) => PngPixels.RgbSink): Long = {
    val f = frame(b)
    if (f == null) return -1L
    val inner = mk(f(0), f(1), f(3))
    if (inner == null) return -1L
    val sink =
      if (f(6) == 0) inner
      else {
        val h = f(1)
        val rowOf = new Array[Int](h)
        var idx = 0
        val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))
        passes.foreach { case (startRow, step) =>
          var r = startRow
          while (r < h) { rowOf(idx) = r; idx += 1; r += step }
        }
        new PngPixels.RgbSink {
          def pixel(x: Int, y: Int, r: Int, g: Int, bl: Int, a: Int): Unit =
            inner.pixel(x, rowOf(y), r, g, bl, a)
        }
      }
    if (!decodeLzw(b, f(5), f(4), f(0), f(1), f(2), f(3), sink)) return -1L
    (f(0).toLong << 32) | (f(1).toLong & 0xffffffffL)
  }

  /** GIF-flavor LZW over the data sub-blocks starting at `p`, streaming
    * palette-mapped samples row-major into the sink. False = malformed
    * stream (truncated, palette overflow, code beyond dictionary).
    */
  private def decodeLzw(b: Array[Byte], start: Int, minCode: Int,
      w: Int, h: Int, ctOff: Int, ctSize: Int,
      sink: PngPixels.RgbSink): Boolean = {
    val total = w.toLong * h
    val clear = 1 << minCode
    val endCode = clear + 1
    // dictionary as (prefix code, appended root) pairs; strings unwind
    // through the stack (an entry chain is at most dict-size long)
    val prefix = new Array[Int](4096)
    val append = new Array[Int](4096)
    val stack = new Array[Int](4097)
    var next = clear + 2
    var codeSize = minCode + 1
    var prev = -1
    var bitBuf = 0L
    var bitCnt = 0
    var q = start
    var blockLeft = 0
    var produced = 0L

    // -1 = truncated/invalid stream
    def readCode(): Int = {
      while (bitCnt < codeSize) {
        if (blockLeft == 0) {
          if (q >= b.length) return -1
          blockLeft = b(q) & 0xff
          q += 1
          if (blockLeft == 0) return -1 // block terminator before END code
        }
        if (q >= b.length) return -1
        bitBuf |= (b(q) & 0xffL) << bitCnt
        q += 1; blockLeft -= 1; bitCnt += 8
      }
      val c = (bitBuf & ((1L << codeSize) - 1)).toInt
      bitBuf >>>= codeSize
      bitCnt -= codeSize
      c
    }

    // false = palette overflow (malformed); overshoot past w·h ignores
    def emit(idx: Int): Boolean =
      if (idx >= ctSize) false
      else {
        if (produced < total) {
          val o = ctOff + 3 * idx
          val r = b(o) & 0xff; val g = b(o + 1) & 0xff; val bl = b(o + 2) & 0xff
          sink.pixel((produced % w).toInt, (produced / w).toInt, r, g, bl, -1)
          produced += 1
        }
        true
      }

    var done = false
    while (!done && produced < total) {
      val code = readCode()
      if (code < 0) return false
      if (code == clear) {
        next = clear + 2; codeSize = minCode + 1; prev = -1
      } else if (code == endCode) {
        done = true
      } else if (prev == -1) {
        if (code >= clear || !emit(code)) return false
        prev = code
      } else {
        var sp = 0
        var firstRoot = 0
        if (code < next) { // known string
          var c = code
          while (c >= clear + 2) { stack(sp) = append(c); sp += 1; c = prefix(c) }
          stack(sp) = c; sp += 1
          firstRoot = c
        } else if (code == next) { // the KwK case: string(prev)+first(prev)
          var f = prev
          while (f >= clear + 2) f = prefix(f)
          stack(sp) = f; sp += 1
          var c = prev
          while (c >= clear + 2) { stack(sp) = append(c); sp += 1; c = prefix(c) }
          stack(sp) = c; sp += 1
          firstRoot = c
        } else return false // code beyond dictionary
        while (sp > 0) { sp -= 1; if (!emit(stack(sp))) return false }
        if (next < 4096) {
          prefix(next) = prev
          append(next) = firstRoot
          next += 1
          if (next < 4096 && next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    produced == total
  }
}
