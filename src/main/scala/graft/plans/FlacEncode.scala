package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** The FLAC planting twin for [[FlacPcm]] — a real, conforming encoder
  * (mono or stereo, 16-bit, fixed 64-sample blocks with an explicit
  * 16-bit block-size field so any length works): per block it emits the
  * smallest of CONSTANT, FIXED order 0–2 with a cost-chosen Rice
  * parameter, or VERBATIM, so planted streams exercise every subframe
  * class the gates decode. Stereo optionally encodes mid/side, which
  * round-trips the decorrelation path. CRC-8/CRC-16 are computed for
  * real — a decoder that skips them still accepts the stream, one that
  * checks them (ours) must see them verify.
  *
  * Gates never compare compressed bytes (subframe choice is an encoder
  * freedom, like deflate in [[PngPlant]]); decoded content is the
  * contract.
  */
object FlacEncode {

  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream(256)
    private var cur = 0
    private var n = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 }
    }
    def bits(v: Long, width: Int): Unit = {
      var i = width - 1
      while (i >= 0) { bit(((v >> i) & 1).toInt); i -= 1 }
    }
    def alignZero(): Unit = while (n != 0) bit(0)
    def bytes(b: Array[Byte]): Unit = {
      require(n == 0, "byte write must be aligned")
      out.write(b, 0, b.length)
    }
    def toBytes: Array[Byte] = { require(n == 0, "unaligned"); out.toByteArray }
    def bitLength: Long = out.size().toLong * 8 + n
  }

  /** FLAC's UTF-8-style coded number. */
  def codedNumber(w: BitWriter, v: Long): Unit = {
    require(v >= 0 && v < (1L << 31))
    if (v < 0x80) w.bits(v, 8)
    else {
      val nBytes =
        if (v < 0x800) 2 else if (v < 0x10000) 3
        else if (v < 0x200000) 4 else if (v < 0x4000000) 5 else 6
      val lead = (0xff << (8 - nBytes)) & 0xff
      w.bits(lead | (v >> (6 * (nBytes - 1))), 8)
      var i = nBytes - 2
      while (i >= 0) { w.bits(0x80 | ((v >> (6 * i)) & 0x3f), 8); i -= 1 }
    }
  }

  private def zigzag(e: Long): Long = (e << 1) ^ (e >> 63)

  /** Rice cost in bits of residuals under parameter r. */
  private def riceCost(res: Array[Long], r: Int): Long = {
    var c = 0L
    var i = 0
    while (i < res.length) { c += (zigzag(res(i)) >>> r) + 1 + r; i += 1 }
    c
  }

  /** Best (param, cost) over 0..14, or escape to verbatim cost. */
  private def bestRice(res: Array[Long]): (Int, Long) = {
    var bestR = 0
    var bestC = Long.MaxValue
    var r = 0
    while (r <= 14) {
      val c = riceCost(res, r)
      if (c < bestC) { bestC = c; bestR = r }
      r += 1
    }
    (bestR, bestC)
  }

  private def writeRice(w: BitWriter, res: Array[Long], param: Int): Unit = {
    w.bits(0, 2) // residual method 0: 4-bit params
    w.bits(0, 4) // partition order 0
    w.bits(param, 4)
    var i = 0
    while (i < res.length) {
      val u = zigzag(res(i))
      val q = (u >>> param).toInt
      var k = 0
      while (k < q) { w.bit(0); k += 1 }
      w.bit(1)
      if (param > 0) w.bits(u & ((1L << param) - 1), param)
      i += 1
    }
  }

  /** One channel's best subframe for `block` at `bps` bits. */
  private def subframe(w: BitWriter, block: Array[Int], bps: Int): Unit = {
    val n = block.length
    var allEq = true
    var i = 1
    while (i < n && allEq) { if (block(i) != block(0)) allEq = false; i += 1 }
    if (allEq) {
      w.bit(0); w.bits(0, 6); w.bit(0) // CONSTANT, no wasted bits
      w.bits(block(0).toLong & ((1L << bps) - 1), bps)
      return
    }
    // fixed-order residuals 0..2, Rice-costed
    def resOf(o: Int): Array[Long] = {
      val r = new Array[Long](n - o)
      var i = o
      while (i < n) {
        r(i - o) = o match {
          case 0 => block(i).toLong
          case 1 => block(i).toLong - block(i - 1)
          case _ => block(i).toLong - 2L * block(i - 1) + block(i - 2)
        }
        i += 1
      }
      r
    }
    var bestO = -1
    var bestParam = 0
    var bestCost = n.toLong * bps // verbatim cost
    var o = 0
    while (o <= 2 && o < n) {
      val (p, c) = bestRice(resOf(o))
      val total = c + o.toLong * bps + 6 // + header-ish slack
      if (total < bestCost) { bestCost = total; bestO = o; bestParam = p }
      o += 1
    }
    if (bestO < 0) {
      w.bit(0); w.bits(1, 6); w.bit(0) // VERBATIM
      var i = 0
      while (i < n) { w.bits(block(i).toLong & ((1L << bps) - 1), bps); i += 1 }
    } else {
      w.bit(0); w.bits(8 + bestO, 6); w.bit(0) // FIXED order bestO
      var i = 0
      while (i < bestO) { w.bits(block(i).toLong & ((1L << bps) - 1), bps); i += 1 }
      writeRice(w, resOf(bestO), bestParam)
    }
  }

  val BlockSize = 64

  /** Encode interleaved 16-bit samples (`channels` ∈ {1, 2}) into a
    * complete FLAC stream. `midSide = true` (stereo only) stores
    * mid/side decorrelated channels.
    */
  def encode(samples: Array[Int], channels: Int = 1,
             midSide: Boolean = false): Array[Byte] = {
    require(channels == 1 || channels == 2, "mono or stereo")
    require(samples.length % channels == 0, "ragged interleave")
    val perCh = samples.length / channels
    val head = new BitWriter
    head.bits(0x664c6143L, 32) // "fLaC"
    head.bit(1); head.bits(0, 7); head.bits(34, 24) // last block, STREAMINFO
    head.bits(BlockSize, 16); head.bits(BlockSize, 16)
    head.bits(0, 24); head.bits(0, 24) // frame sizes unknown
    head.bits(16000, 20)
    head.bits(channels - 1, 3)
    head.bits(15, 5) // bps - 1 = 15
    head.bits(perCh.toLong, 36)
    var i = 0
    while (i < 16) { head.bits(0, 8); i += 1 } // md5 unknown
    val out = new java.io.ByteArrayOutputStream(samples.length)
    out.write(head.toBytes)

    var frameNo = 0L
    var pos = 0
    while (pos < perCh) {
      val bs = math.min(BlockSize, perCh - pos)
      val w = new BitWriter
      w.bits(0x3ffe, 14) // sync
      w.bit(0) // reserved
      w.bit(0) // fixed blocksize strategy
      w.bits(7, 4) // blocksize: explicit 16-bit at header end
      w.bits(0, 4) // sample rate: from STREAMINFO
      val chCode = if (channels == 1) 0 else if (midSide) 10 else 1
      w.bits(chCode, 4)
      w.bits(4, 3) // sample size 16-bit
      w.bit(0) // reserved
      codedNumber(w, frameNo)
      w.bits(bs - 1, 16)
      val headerBytes = w.toBytes
      val fw = new BitWriter
      fw.bytes(headerBytes)
      fw.bits(FlacPcm.crc8(headerBytes, 0, headerBytes.length), 8)
      if (channels == 1) {
        val block = java.util.Arrays.copyOfRange(samples, pos, pos + bs)
        subframe(fw, block, 16)
      } else {
        val l = new Array[Int](bs)
        val r = new Array[Int](bs)
        var k = 0
        while (k < bs) {
          l(k) = samples(2 * (pos + k))
          r(k) = samples(2 * (pos + k) + 1)
          k += 1
        }
        if (midSide) {
          val mid = new Array[Int](bs)
          val side = new Array[Int](bs)
          k = 0
          while (k < bs) {
            mid(k) = (l(k) + r(k)) >> 1
            side(k) = l(k) - r(k)
            k += 1
          }
          subframe(fw, mid, 16)
          subframe(fw, side, 17)
        } else {
          subframe(fw, l, 16)
          subframe(fw, r, 16)
        }
      }
      fw.alignZero()
      val frameBytes = fw.toBytes
      out.write(frameBytes)
      val crc = FlacPcm.crc16(frameBytes, 0, frameBytes.length)
      out.write((crc >> 8) & 0xff)
      out.write(crc & 0xff)
      frameNo += 1
      pos += bs
    }
    out.toByteArray
  }
}

/** `flac_plant_cell(seed, m)` — [[graft.plans.AudioCellPlant]]'s sample
  * stream as a REAL FLAC encoding: the mixed-codec twin of
  * [[WavPlantCell]] (same samples, different container), so the WAV and
  * FLAC fingerprints of one seed must collide at Hamming 0.
  */
case class FlacPlantCell(child: Expression, m: Int) extends UnaryExpression {
  require(m >= 1 && m <= 16, s"upsample factor out of range: $m")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"flac_plant_cell requires bigint, got $t")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "flac_plant_cell"

  override def nullSafeEval(input: Any): Any =
    FlacEncode.encode(AudioCellPlant.samples(input.asInstanceOf[Long], m))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.FlacEncode.encode(graft.plans.AudioCellPlant.samples($c, $m), 1, false)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `flac_plant_wide(seed)` — the stats-gate plant: full-range samples
  *
  *   v(i) = ((s·7919 + i·104729) mod 65536) − 32768,
  *   forced full-scale at i % 50 = 7 (32767) and i % 50 = 29 (−32768),
  *   n = 100 + s % 64 samples
  *
  * — negative values, clipping, multi-frame streams with a short tail
  * block, and residual magnitudes that push blocks between CONSTANT /
  * FIXED / VERBATIM choices. The oracle restates the formulas.
  */
case class FlacPlantWide(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"flac_plant_wide requires bigint, got $t")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "flac_plant_wide"

  override def nullSafeEval(input: Any): Any =
    FlacPlantWide.encode(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.FlacPlantWide.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FlacPlantWide {
  def nOf(s: Long): Int = (100 + s % 64).toInt

  def sampleAt(s: Long, i: Int): Int =
    if (i % 50 == 7) 32767
    else if (i % 50 == 29) -32768
    else (((s * 7919 + i.toLong * 104729) % 65536) - 32768).toInt

  /** Static so generated code calls it directly. */
  def encode(s: Long): Array[Byte] = {
    val n = nOf(s)
    val sm = Array.tabulate(n)(i => sampleAt(s, i))
    FlacEncode.encode(sm)
  }
}
