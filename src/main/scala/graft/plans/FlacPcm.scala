package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Pure-JVM FLAC decode — the compressed-audio member the round-13
  * verdict ranked first among audio gaps: crawled audio is rarely raw
  * PCM, and FLAC is the one mainstream lossless codec decodable without
  * a codec library (Rice-coded residuals over fixed/LPC predictors,
  * CRC-framed — the X99 GIF-LZW / baseline-JPEG effort class).
  *
  * Supported surface (16-bit only, the [[WavPcm]] contract):
  *   - STREAMINFO walk + arbitrary metadata-block skip;
  *   - frames with explicit/tabled block sizes, UTF-8-coded frame
  *     numbers, CRC-8 header and CRC-16 frame checks (a corrupted frame
  *     stops the stream at the last good frame — the truncated-blob
  *     shape [[WavPcm.walk]] applies);
  *   - subframes: CONSTANT, VERBATIM, FIXED orders 0–4, LPC any order,
  *     wasted-bits shift;
  *   - partitioned Rice residuals, both 4- and 5-bit parameter widths,
  *     escape partitions;
  *   - channel assignments: independent (any count, interleaved like
  *     WAV), left/side, right/side, mid/side.
  *
  * Decoded samples feed the SAME [[WavPcm.SampleSink]] visitor, so
  * stats, VAD segmentation, and the envelope fingerprint ride a FLAC
  * blob unchanged — the X216 shared-core discipline applied to audio.
  * Exactness: FLAC is lossless and all-integer, so planted sample
  * formulas survive an encode→decode round trip bit-for-bit and the
  * DuckDB oracle restates them directly.
  *
  * [[FlacEncode]] is the planting twin: a real encoder (CONSTANT /
  * FIXED-with-Rice / VERBATIM per block, whichever is smallest; mono or
  * stereo incl. mid/side) whose output any conforming decoder accepts —
  * the gates never compare compressed bytes, only decoded content.
  * A 64 MiB output cap guards decompression bombs (X113 discipline).
  */
object FlacPcm {

  /** Decompression-bomb guard: max decoded samples (× 2 bytes). */
  val MaxSamples: Int = 32 << 20

  private final class BitReader(b: Array[Byte]) {
    var pos = 0 // bit position
    def bytePos: Int = pos >>> 3
    def aligned: Boolean = (pos & 7) == 0
    def remaining: Int = b.length * 8 - pos
    def bit(): Int = {
      val v = (b(pos >>> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def signedBits(n: Int): Int = {
      val v = bits(n)
      ((v << (64 - n)).toLong >> (64 - n)).toInt
    }
    def unary(): Int = {
      var q = 0
      while (bit() == 0) {
        q += 1
        if (q > (1 << 24)) throw new IllegalStateException("unary runaway")
      }
      q
    }
    def align(): Unit = pos = (pos + 7) & ~7
  }

  /** CRC-8, poly 0x07, init 0 — the FLAC frame-header checksum. */
  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var j = 0
      while (j < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        j += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 — the FLAC whole-frame checksum. */
  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var j = 0
      while (j < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        j += 1
      }
      i += 1
    }
    crc
  }

  /** FLAC's UTF-8-style coded number (frame/sample index). -1 = bad. */
  private def codedNumber(r: BitReader): Long = {
    val b0 = r.bits(8).toInt
    if ((b0 & 0x80) == 0) return b0
    var n = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { n += 1; mask >>= 1 }
    if (n < 1 || n > 6) return -1
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < n) {
      val c = r.bits(8).toInt
      if ((c & 0xc0) != 0x80) return -1
      v = (v << 6) | (c & 0x3f)
      i += 1
    }
    v
  }

  /** Residual decode into `out[predOrder until blockSize]`. */
  private def residuals(r: BitReader, out: Array[Int], predOrder: Int,
                        blockSize: Int): Unit = {
    val method = r.bits(2).toInt
    if (method > 1) throw new IllegalStateException("reserved residual method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.bits(4).toInt
    val parts = 1 << po
    if (blockSize % parts != 0 || (blockSize >> po) < predOrder)
      throw new IllegalStateException("bad partition order")
    var i = predOrder
    var p = 0
    while (p < parts) {
      val count = (blockSize >> po) - (if (p == 0) predOrder else 0)
      if (count < 0) throw new IllegalStateException("bad partition count")
      val param = r.bits(pBits).toInt
      if (param == escape) {
        val nb = r.bits(5).toInt
        var k = 0
        while (k < count) { out(i) = if (nb == 0) 0 else r.signedBits(nb); i += 1; k += 1 }
      } else {
        var k = 0
        while (k < count) {
          val q = r.unary()
          val rem = if (param == 0) 0L else r.bits(param)
          val u = (q.toLong << param) | rem
          out(i) = ((u >>> 1) ^ -(u & 1)).toInt // zigzag
          i += 1; k += 1
        }
      }
      p += 1
    }
  }

  /** One subframe into `out` (len blockSize) at `bps` bits. */
  private def subframe(r: BitReader, out: Array[Int], blockSize: Int, bps: Int): Unit = {
    if (r.bit() != 0) throw new IllegalStateException("subframe pad bit")
    val tpe = r.bits(6).toInt
    val wasted =
      if (r.bit() == 1) r.unary() + 1
      else 0
    val ebps = bps - wasted
    if (ebps <= 0 || ebps > 32) throw new IllegalStateException("bad effective bps")
    tpe match {
      case 0 => // CONSTANT
        val v = r.signedBits(ebps)
        java.util.Arrays.fill(out, 0, blockSize, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < blockSize) { out(i) = r.signedBits(ebps); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED order 0-4
        val o = t - 8
        if (o > blockSize) throw new IllegalStateException("order > blockSize")
        var i = 0
        while (i < o) { out(i) = r.signedBits(ebps); i += 1 }
        residuals(r, out, o, blockSize)
        i = o
        while (i < blockSize) {
          val p = o match {
            case 0 => 0L
            case 1 => out(i - 1).toLong
            case 2 => 2L * out(i - 1) - out(i - 2)
            case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
            case _ => 4L * out(i - 1) - 6L * out(i - 2) + 4L * out(i - 3) - out(i - 4)
          }
          out(i) = (out(i) + p).toInt
          i += 1
        }
      case t if t >= 32 => // LPC order 1-32
        val o = t - 31
        if (o > blockSize) throw new IllegalStateException("order > blockSize")
        var i = 0
        while (i < o) { out(i) = r.signedBits(ebps); i += 1 }
        val precision = r.bits(4).toInt + 1
        if (precision > 15) throw new IllegalStateException("reserved qlp precision")
        val shift = r.signedBits(5)
        if (shift < 0) throw new IllegalStateException("negative qlp shift")
        val coef = new Array[Int](o)
        i = 0
        while (i < o) { coef(i) = r.signedBits(precision); i += 1 }
        residuals(r, out, o, blockSize)
        i = o
        while (i < blockSize) {
          var acc = 0L
          var j = 0
          while (j < o) { acc += coef(j).toLong * out(i - 1 - j); j += 1 }
          out(i) = (out(i) + (acc >> shift)).toInt
          i += 1
        }
      case _ => throw new IllegalStateException(s"reserved subframe type $tpe")
    }
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) = out(i) << wasted; i += 1 }
    }
  }

  /** Shared decode: STREAMINFO walk, then every decoded 16-bit sample
    * (channels interleaved, WAV convention) into `sink`. Returns the
    * emitted sample count, or -1 when the blob is not decodable 16-bit
    * FLAC at all. A frame failing its CRC (or truncated mid-frame)
    * stops the stream at the last GOOD frame — the truncated-blob
    * shape.
    */
  def walk(b: Array[Byte], sink: WavPcm.SampleSink): Int = {
    if (b == null || b.length < 42 ||
      b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return -1
    try {
      val r = new BitReader(b)
      r.pos = 32
      // metadata blocks; first must be STREAMINFO
      var last = false
      var first = true
      var channels = -1
      var bps = -1
      while (!last) {
        last = r.bit() == 1
        val tpe = r.bits(7).toInt
        val len = r.bits(24).toInt
        if (first) {
          if (tpe != 0 || len != 34) return -1
          r.bits(16); r.bits(16) // min/max blocksize
          r.bits(24); r.bits(24) // min/max framesize
          r.bits(20) // sample rate
          channels = r.bits(3).toInt + 1
          bps = r.bits(5).toInt + 1
          r.bits(36) // total samples
          var i = 0
          while (i < 16) { r.bits(8); i += 1 } // md5
          first = false
        } else {
          if (len * 8L > r.remaining) return -1
          r.pos += len * 8
        }
      }
      if (bps != 16) return -1 // the 16-bit contract (WavPcm's)
      var emitted = 0
      var done = false
      while (!done && r.remaining >= 40) {
        val frameStart = r.bytePos
        val got = try {
          if (r.bits(14) != 0x3ffe) throw new IllegalStateException("lost sync")
          if (r.bit() != 0) throw new IllegalStateException("reserved bit")
          r.bit() // blocking strategy
          val bsCode = r.bits(4).toInt
          val srCode = r.bits(4).toInt
          val chCode = r.bits(4).toInt
          val ssCode = r.bits(3).toInt
          if (r.bit() != 0) throw new IllegalStateException("reserved bit 2")
          if (codedNumber(r) < 0) throw new IllegalStateException("bad coded number")
          val blockSize = bsCode match {
            case 0 => throw new IllegalStateException("reserved blocksize")
            case 1 => 192
            case n if n <= 5 => 576 << (n - 2)
            case 6 => r.bits(8).toInt + 1
            case 7 => r.bits(16).toInt + 1
            case n => 256 << (n - 8)
          }
          srCode match {
            case 12 => r.bits(8)
            case 13 | 14 => r.bits(16)
            case 15 => throw new IllegalStateException("invalid sample rate code")
            case _ => ()
          }
          val frameBps = ssCode match {
            case 0 => bps
            case 1 => 8
            case 2 => 12
            case 4 => 16
            case 5 => 20
            case 6 => 24
            case 7 => 32
            case _ => throw new IllegalStateException("reserved sample size")
          }
          if (frameBps != 16) throw new IllegalStateException("non-16-bit frame")
          val nCh = if (chCode <= 7) chCode + 1
            else if (chCode <= 10) 2
            else throw new IllegalStateException("reserved channel assignment")
          if (nCh != channels) throw new IllegalStateException("channel drift")
          if (!r.aligned) throw new IllegalStateException("unaligned header")
          if (crc8(b, frameStart, r.bytePos) != r.bits(8).toInt)
            throw new IllegalStateException("header crc")
          if (emitted.toLong + blockSize.toLong * nCh > MaxSamples)
            throw new IllegalStateException("bomb cap")
          val ch = Array.ofDim[Int](nCh, blockSize)
          var c = 0
          while (c < nCh) {
            val extra = chCode match {
              case 8 => if (c == 1) 1 else 0 // left/side
              case 9 => if (c == 0) 1 else 0 // right/side (side first)
              case 10 => if (c == 1) 1 else 0 // mid/side
              case _ => 0
            }
            subframe(r, ch(c), blockSize, frameBps + extra)
            c += 1
          }
          chCode match {
            case 8 => // left/side: right = left - side
              var i = 0
              while (i < blockSize) { ch(1)(i) = ch(0)(i) - ch(1)(i); i += 1 }
            case 9 => // right/side: left = right + side (stored side, right)
              var i = 0
              while (i < blockSize) {
                val right = ch(1)(i)
                ch(0)(i) = right + ch(0)(i)
                ch(1)(i) = right
                i += 1
              }
            case 10 => // mid/side
              var i = 0
              while (i < blockSize) {
                val side = ch(1)(i)
                val mid2 = (ch(0)(i) << 1) | (side & 1)
                ch(0)(i) = (mid2 + side) >> 1
                ch(1)(i) = (mid2 - side) >> 1
                i += 1
              }
            case _ => ()
          }
          r.align()
          val frameEnd = r.bytePos
          if (crc16(b, frameStart, frameEnd) != r.bits(16).toInt)
            throw new IllegalStateException("frame crc")
          var i = 0
          while (i < blockSize) {
            var cc = 0
            while (cc < nCh) {
              sink.sample(emitted, ch(cc)(i))
              emitted += 1
              cc += 1
            }
            i += 1
          }
          true
        } catch { case scala.util.control.NonFatal(_) => false }
        if (!got) done = true
      }
      emitted
    } catch { case scala.util.control.NonFatal(_) => -1 }
  }

  private final class StatsSink extends WavPcm.SampleSink {
    var sumAbs = 0L; var peak = 0L; var clip = 0L
    def sample(i: Int, v: Int): Unit = {
      val a = if (v < 0) -v.toLong else v.toLong
      sumAbs += a
      if (a > peak) peak = a
      if (v == 32767 || v == -32768) clip += 1
    }
  }

  /** Static so generated code calls it directly. Never null, never
    * throws; non-FLAC input yields an all-null struct (the [[WavPcm]]
    * failure-count contract).
    */
  def parse(b: Array[Byte]): InternalRow = {
    val s = new StatsSink
    val k = walk(b, s)
    if (k < 0) {
      val r = new GenericInternalRow(4)
      r.setNullAt(0); r.setNullAt(1); r.setNullAt(2); r.setNullAt(3)
      return r
    }
    val r = new GenericInternalRow(4)
    r.setLong(0, k.toLong); r.setLong(1, s.sumAbs); r.setLong(2, s.peak)
    r.setLong(3, s.clip)
    r
  }
}

/** `flac_pcm(content)` — amplitude statistics over a decoded FLAC
  * stream: (n_samples, sum_abs, peak, clip_count), the [[WavPcm]]
  * schema over the compressed codec.
  */
case class FlacPcmStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"flac_pcm requires binary, got $t")
    }

  override def dataType: DataType = WavPcm.Schema
  override def prettyName: String = "flac_pcm"

  override def nullSafeEval(input: Any): Any =
    FlacPcm.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.FlacPcm.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `flac_afp(content, cells)` — the [[WavFingerprint]] energy-envelope
  * fingerprint over a decoded FLAC stream: one fingerprint definition,
  * two codecs, so a WAV master and its FLAC re-encode hash identically
  * (the mixed-format join's premise, as [[DhashCore]] for images).
  */
case class FlacFingerprint(child: Expression, cells: Int) extends UnaryExpression {
  require(cells >= 1 && cells <= 64, s"cells out of range: $cells")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"flac_afp requires binary, got $t")
    }

  override def dataType: DataType = WavFingerprint.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "flac_afp"

  override def nullSafeEval(input: Any): Any =
    WavFingerprint.envelopeOver(FlacPcm.walk, input.asInstanceOf[Array[Byte]], cells)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("afp")
      s"""InternalRow $r = graft.plans.FlacFingerprint.compute($c, $cells);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FlacFingerprint {
  /** Static for codegen. */
  def compute(b: Array[Byte], cells: Int): InternalRow =
    WavFingerprint.envelopeOver(FlacPcm.walk, b, cells)
}
