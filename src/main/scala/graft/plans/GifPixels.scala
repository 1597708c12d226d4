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

  /** Static so generated code calls it directly. Never null, never throws. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 14) return nulls
    if (b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
        !(b(4) == '7' || b(4) == '9') || b(5) != 'a') return nulls
    def le16(p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

    val screenPacked = b(10) & 0xff
    var p = 13
    var gctOff = -1
    var gctSize = 0
    if ((screenPacked & 0x80) != 0) {
      gctSize = 1 << ((screenPacked & 7) + 1)
      gctOff = p
      p += 3 * gctSize
      if (p > b.length) return nulls
    }

    while (p < b.length) {
      (b(p) & 0xff) match {
        case 0x3b => return nulls // trailer before any image frame
        case 0x21 => // extension: label + sub-blocks, content-agnostic skip
          p += 2
          while (p < b.length && (b(p) & 0xff) != 0) p += 1 + (b(p) & 0xff)
          if (p >= b.length) return nulls
          p += 1
        case 0x2c => // image descriptor: the frame we decode
          if (p + 10 > b.length) return nulls
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
          if (ctOff < 0 || ctOff + 3 * ctSize > b.length) return nulls
          if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15)) return nulls
          if (p >= b.length) return nulls
          val minCode = b(p) & 0xff
          p += 1
          if (minCode < 2 || minCode > 11) return nulls
          return decodeLzw(b, p, minCode, w, h, ctOff, ctSize)
        case _ => return nulls
      }
    }
    nulls
  }

  /** GIF-flavor LZW over the data sub-blocks starting at `p`, streaming
    * palette-mapped samples straight into the accumulators.
    */
  private def decodeLzw(b: Array[Byte], start: Int, minCode: Int,
      w: Int, h: Int, ctOff: Int, ctSize: Int): InternalRow = {
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
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var peak = 0

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
          sumR += r; sumG += g; sumB += bl
          if (r > peak) peak = r
          if (g > peak) peak = g
          if (bl > peak) peak = bl
          produced += 1
        }
        true
      }

    var done = false
    while (!done && produced < total) {
      val code = readCode()
      if (code < 0) return nulls
      if (code == clear) {
        next = clear + 2; codeSize = minCode + 1; prev = -1
      } else if (code == endCode) {
        done = true
      } else if (prev == -1) {
        if (code >= clear || !emit(code)) return nulls
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
        } else return nulls // code beyond dictionary
        while (sp > 0) { sp -= 1; if (!emit(stack(sp))) return nulls }
        if (next < 4096) {
          prefix(next) = prev
          append(next) = firstRoot
          next += 1
          if (next < 4096 && next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    if (produced < total) return nulls

    val r = new GenericInternalRow(8)
    r.setInt(0, w); r.setInt(1, h); r.setInt(2, ctSize)
    r.setLong(3, total)
    r.setLong(4, sumR); r.setLong(5, sumG); r.setLong(6, sumB)
    r.setInt(7, peak)
    r
  }
}
