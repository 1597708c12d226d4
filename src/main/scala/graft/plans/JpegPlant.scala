package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic REAL-JPEG planting for the [[JpegPixels]] gate — the
  * [[PngPlant]] pattern for a LOSSY codec, made oracle-expressible by
  * construction: every 8×8 block is a solid value, so its FDCT is
  * DC-only, and the luminance quant table pins Q(0,0)=8, so the DC
  * round-trip `round(8·(v−128)/8)·8 → IDCT → v` is integer-exact.
  * Decoded pixels therefore equal the planted block values EXACTLY and
  * the DuckDB oracle restates them arithmetically — while the decoder
  * still has to beat a genuine entropy-coded baseline stream: canonical
  * Annex-K Huffman tables, DC prediction across blocks, byte stuffing,
  * and (every fifth doc) a DRI/RSTn restart cadence that resets
  * predictors mid-scan.
  *
  * A real media pipeline never runs this expression — it exists to feed
  * [[JpegPixels]] genuine bytes under oracle control; arbitrary-photo
  * coverage (AC coefficients, subsampled color, edge blocks) is
  * golden-tested in JpegPixelsSpec against ImageIO-encoded rasters.
  */
case class JpegPlant(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"jpeg_plant requires bigint, got $t")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "jpeg_plant"

  override def nullSafeEval(input: Any): Any =
    JpegPlant.encode(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.JpegPlant.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JpegPlant {

  def widthBlocksOf(docId: Long): Int = (1 + docId % 4).toInt
  def heightBlocksOf(docId: Long): Int = (1 + docId % 3).toInt

  /** Solid value of block k (row-major) — restated by the oracle. The
    * `salt` varies pixel content across MJPEG video frames while dims
    * stay fixed by docId (frames of one stream share geometry);
    * salt == 0 is the still-image gate's formula.
    */
  def blockValOf(docId: Long, k: Int): Int = blockValOf(docId, 0, k)
  def blockValOf(docId: Long, salt: Int, k: Int): Int =
    ((docId * 37 + salt.toLong * 101 + k.toLong * 59) % 256).toInt

  /** Annex K Table K.3 — luminance DC: code lengths and symbols. */
  private val DcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array[Int](0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Annex K Table K.5 — luminance AC (only EOB and a few symbols are
    * ever emitted here, but the DHT segment carries the full table so
    * the decoder builds real-sized canonical codes).
    */
  private val AcBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array[Int](
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical encode table: symbol → (code, length). */
  private def encodeTable(bits: Array[Int], vals: Array[Int]): Array[Array[Int]] = {
    val out = Array.ofDim[Int](256, 2)
    var code = 0; var k = 0; var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        out(vals(k)) = Array(code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1; l += 1
    }
    out
  }

  private val DcCodes = encodeTable(DcBits, DcVals)
  private val AcCodes = encodeTable(AcBits, AcVals)

  /** Progressive AC-scan table: the EOBn symbols (0xN0) Annex K's
    * baseline table does not carry — emitted as a DHT between scans, so
    * the decoder's per-scan table redefinition is exercised in-gate.
    * Lengths avoid the all-ones code of each size (T.81 C.2).
    */
  private val ProgAcBits = Array(0, 0, 3, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val ProgAcVals = Array[Int](0x00, 0x10, 0x20, 0x30, 0x40)
  private val ProgAcCodes = encodeTable(ProgAcBits, ProgAcVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad to a byte boundary with 1-bits, per T.81 F.1.2.3. */
    def flush(): Unit = if (cnt > 0) put((1 << (8 - cnt)) - 1, 8 - cnt)
  }

  /** Static so generated code calls it directly. Every seventh doc
    * (docId%7==2) is coded PROGRESSIVE (SOF2: DC first with Al=1, DC
    * refinement, AC EOB-run scan — successive approximation round-trips
    * exactly because `((dc>>1)<<1) | (dc&1) == dc`), so the gate
    * exercises the multi-scan path with the SAME closed-form pixels and
    * the SAME oracle; the rest stay baseline. docId%5==0 plants DRI in
    * both codings (ids ≡ 30 mod 35 are progressive WITH restarts).
    */
  def encode(docId: Long): Array[Byte] =
    if (docId % 7 == 2) encodeProgressive(docId, 0) else encodeFrame(docId, 0)

  /** Progressive (SOF2) plant: three scans — DC first (Ah=0, Al=1), DC
    * refinement (Ah=1, Al=0, raw bits), AC 1..63 first scan where every
    * block is all-zero so the whole traversal is EOB-run coded. Restart
    * cadence (when docId%5==0) applies per scan, resetting predictors
    * and EOB runs, exactly the states a progressive decoder must clear.
    */
  def encodeProgressive(docId: Long, salt: Int): Array[Byte] = {
    val wb = widthBlocksOf(docId)
    val hb = heightBlocksOf(docId)
    val w = wb * 8; val h = hb * 8
    val restart = if (docId % 5 == 0) 2 else 0
    val out = new java.io.ByteArrayOutputStream(512)
    def m(marker: Int, payload: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      out.write((payload.length + 2) >> 8); out.write((payload.length + 2) & 0xff)
      payload.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    m(0xe0, Array(0x4a, 0x46, 0x49, 0x46, 0x00, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    m(0xdb, Array(0x00) ++ Array.tabulate(64)(i => if (i == 0) 8 else 16))
    m(0xc4, (Array(0x00) ++ DcBits.drop(1) ++ DcVals) ++
      (Array(0x10) ++ AcBits.drop(1) ++ AcVals))
    if (restart > 0) m(0xdd, Array(restart >> 8, restart & 0xff))
    // SOF2: 8-bit, h×w, 1 component, 1×1 sampling, quant table 0
    m(0xc2, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0))
    val nb = wb * hb
    val dcOf = Array.tabulate(nb)(k => blockValOf(docId, salt, k) - 128)

    var rstIdx = 0
    def rst(bw: BitWriter): Unit = {
      bw.flush()
      out.write(0xff); out.write(0xd0 + (rstIdx % 8))
      rstIdx += 1
    }

    // scan 1: DC first, point transform Al=1 (codes dc >> 1, arithmetic)
    m(0xda, Array(1, 1, 0x00, 0, 0, 0x01))
    locally {
      val bw = new BitWriter(out)
      rstIdx = 0
      var pred = 0
      var k = 0
      while (k < nb) {
        if (restart > 0 && k > 0 && k % restart == 0) { rst(bw); pred = 0 }
        val v = dcOf(k) >> 1
        val diff = v - pred
        pred = v
        val a = if (diff < 0) -diff else diff
        val t = 32 - Integer.numberOfLeadingZeros(a)
        bw.put(DcCodes(t)(0), DcCodes(t)(1))
        if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
        k += 1
      }
      bw.flush()
    }

    // scan 2: DC refinement, Ah=1 Al=0 — one raw bit per block (dc & 1)
    m(0xda, Array(1, 1, 0x00, 0, 0, 0x10))
    locally {
      val bw = new BitWriter(out)
      rstIdx = 0
      var k = 0
      while (k < nb) {
        if (restart > 0 && k > 0 && k % restart == 0) rst(bw)
        bw.put(dcOf(k) & 1, 1)
        k += 1
      }
      bw.flush()
    }

    // scan 3: AC 1..63 first scan — every block all-zero, EOB-run coded
    // (one EOBn per restart segment; without DRI, one run spans them all).
    // A fresh DHT first: EOBn symbols live in a progressive-only table.
    m(0xc4, Array(0x10) ++ ProgAcBits.drop(1) ++ ProgAcVals)
    m(0xda, Array(1, 1, 0x00, 1, 63, 0x00))
    locally {
      val bw = new BitWriter(out)
      rstIdx = 0
      var k = 0
      while (k < nb) {
        val segLen = if (restart > 0) math.min(restart, nb - k) else nb - k
        if (k > 0) rst(bw)
        // EOBn: run = segLen = (1<<r) + extra, r chosen maximal
        val r = 31 - Integer.numberOfLeadingZeros(segLen)
        bw.put(ProgAcCodes(r << 4)(0), ProgAcCodes(r << 4)(1))
        if (r > 0) bw.put(segLen - (1 << r), r)
        k += segLen
      }
      bw.flush()
    }

    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** One MJPEG frame: geometry from docId, content salted by frame
    * index — see [[AviPlant]].
    */
  def encodeFrame(docId: Long, salt: Int): Array[Byte] = {
    val wb = widthBlocksOf(docId)
    val hb = heightBlocksOf(docId)
    val w = wb * 8; val h = hb * 8
    val restart = if (docId % 5 == 0) 2 else 0 // DRI every 2 MCUs for 1 in 5 docs
    val out = new java.io.ByteArrayOutputStream(512)
    def m(marker: Int, payload: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      out.write((payload.length + 2) >> 8); out.write((payload.length + 2) & 0xff)
      payload.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    m(0xe0, Array(0x4a, 0x46, 0x49, 0x46, 0x00, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0/JFIF
    m(0xfe, "graft plant".getBytes.map(_ & 0xff)) // COM — the skip path
    // DQT: Q(0,0)=8 (the DC-exact pin), AC entries 16 (never used: AC=0)
    m(0xdb, Array(0x00) ++ Array.tabulate(64)(i => if (i == 0) 8 else 16))
    // DHT: DC table 0 then AC table 0 in one segment
    m(0xc4, (Array(0x00) ++ DcBits.drop(1) ++ DcVals) ++
      (Array(0x10) ++ AcBits.drop(1) ++ AcVals))
    if (restart > 0) m(0xdd, Array(restart >> 8, restart & 0xff))
    // SOF0: 8-bit, h×w, 1 component, 1×1 sampling, quant table 0
    m(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0))
    // SOS: 1 component, DC/AC table 0, spectral selection 0..63
    m(0xda, Array(1, 1, 0x00, 0, 63, 0))
    val bw = new BitWriter(out)
    var pred = 0
    var k = 0
    val nb = wb * hb
    var rstIdx = 0
    while (k < nb) {
      if (restart > 0 && k > 0 && k % restart == 0) {
        bw.flush()
        out.write(0xff); out.write(0xd0 + (rstIdx % 8))
        rstIdx += 1
        pred = 0
      }
      val v = blockValOf(docId, salt, k)
      val dc = v - 128 // quantized DC: round(8(v-128)/8)
      val diff = dc - pred
      pred = dc
      val a = if (diff < 0) -diff else diff
      val t = 32 - Integer.numberOfLeadingZeros(a) // category; 0 when diff==0
      bw.put(DcCodes(t)(0), DcCodes(t)(1))
      if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      bw.put(AcCodes(0x00)(0), AcCodes(0x00)(1)) // EOB — all AC zero
      k += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
