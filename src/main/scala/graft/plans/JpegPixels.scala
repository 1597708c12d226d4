package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructType}

/** Real baseline-JPEG pixel decode — the last piece of the X11 image
  * stub ([[graft.multimodal.Multimodal]]; reference: media decode paths)
  * done with NO codec library: marker walk → DQT/DHT/SOF0/DRI/SOS →
  * Huffman entropy decode with 0xFF00 byte-unstuffing and RSTn restart
  * handling → dequantize in zig-zag order → separable 2-D IDCT → level
  * shift → (for 3-component scans) box-upsampled YCbCr→RGB. Supports
  * baseline sequential DCT (SOF0/SOF1) and PROGRESSIVE DCT (SOF2,
  * round 9): multi-scan spectral selection + successive approximation —
  * DC first/refine scans (interleaved or single-component), AC
  * first/refine scans with EOB-run coding, per-scan Huffman table
  * redefinition, restart intervals in either traversal — accumulated in
  * per-component zigzag coefficient stores and IDCT'd once at the end.
  * 8-bit precision, 1 or 3 components, arbitrary 1–4 sampling factors
  * (4:4:4, 4:2:2, 4:2:0, …), 8- or 16-bit quantization entries.
  * Lossless/arithmetic/hierarchical scans report nulls.
  *
  * Output is the filter-stat struct a curation pipeline aggregates
  * first: dimensions, channel count, per-channel integer pixel sums and
  * the peak sample — enough for brightness/contrast routing and
  * solid-color detection without materializing rasters.
  *
  * Correctness is pinned two ways: [[JpegPlant]] plants DC-exact
  * grayscale JPEGs whose decoded pixels are closed-form in doc_id (the
  * DuckDB gate restates them arithmetically — quantizer round-trip
  * exactness makes a lossy codec oracle-expressible), and JpegPixelsSpec
  * golden-tests arbitrary color rasters against the JDK's own
  * independent ImageIO codec (±1 IDCT conformance tolerance).
  *
  * Per-row, shuffle-free, whole-stage codegen; malformed inputs yield
  * in-struct nulls, never a throw.
  */
case class JpegPixels(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"jpeg_pixels requires binary, got $t")
    }

  override def dataType: DataType = JpegPixels.Schema
  override def prettyName: String = "jpeg_pixels"

  override def nullSafeEval(input: Any): Any =
    JpegPixels.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.JpegPixels.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JpegPixels {

  /** Upper bound on claimed width*height from an untrusted SOF header
    * (same cap as PngPixels): blobs claiming more are rejected before
    * any plane allocation.
    */
  private val MaxPixels: Int = 1 << 24

  val Schema: StructType = new StructType()
    .add("width", IntegerType)
    .add("height", IntegerType)
    .add("channels", IntegerType)
    .add("n_pixels", LongType)
    .add("sum_r", LongType)
    .add("sum_g", LongType)
    .add("sum_b", LongType)
    .add("peak", IntegerType)

  /** Zig-zag index → natural (row-major) index. */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // COS(x)(u) = C(u)/2 · cos((2x+1)uπ/16) — the separable IDCT basis
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman decode tables (ITU T.81 F.2.2.3 layout). */
  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Byte] = vals
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valPtr(l) = k; minCode(l) = code
          code += bits(l); k += bits(l); maxCode(l) = code - 1
        } else maxCode(l) = -1
        code <<= 1; l += 1
      }
    }
  }

  private final class Reader(b: Array[Byte], var p: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    var atMarker = false

    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (atMarker || p >= b.length) { atMarker = true; return 0 }
        var byte = b(p) & 0xff; p += 1
        if (byte == 0xff) {
          val nb = if (p < b.length) b(p) & 0xff else -1
          if (nb == 0) p += 1 // stuffed data 0xFF
          else { atMarker = true; p -= 1; return 0 }
        }
        bitBuf = byte; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    def decode(h: Huff): Int = {
      var code = nextBit(); var l = 1
      while (code > h.maxCode(l) || h.maxCode(l) < 0) {
        l += 1
        if (l > 16) throw new IllegalStateException("bad huffman code")
        code = (code << 1) | nextBit()
      }
      h.values(h.valPtr(l) + code - h.minCode(l)) & 0xff
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Boolean = {
      bitCnt = 0; atMarker = false
      if (p + 2 > b.length || (b(p) & 0xff) != 0xff) return false
      val m = b(p + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      p += 2; true
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def be16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  private def nulls(): InternalRow = {
    val r = new GenericInternalRow(8)
    var i = 0; while (i < 8) { r.setNullAt(i); i += 1 }
    r
  }

  /** Static so generated code calls it directly. Never null, never throws. */
  def parse(b: Array[Byte]): InternalRow =
    try parseOrThrow(b)
    catch { case scala.util.control.NonFatal(_) => nulls() }

  /** Shared-visitor pixel walk (the [[PngPixels.walk]] twin): one full
    * entropy decode, every pixel emitted row-major into the sink built
    * by `mk` — called once with the decoded dimensions so the consumer
    * can size itself, or return null to reject (e.g. a sub-grid image:
    * no work wasted on the scan). Returns `(w << 32) | h`, −1 on
    * malformed input or a null sink. Alpha is −1 — JPEG carries none.
    * Single-component images ride the gray plane directly (no per-pixel
    * tuple), the common case for planted fixtures and document scans.
    */
  def walk(b: Array[Byte], mk: (Int, Int) => PngPixels.RgbSink): Long = {
    val d =
      (try decode(b) catch { case scala.util.control.NonFatal(_) => None }).orNull
    if (d == null) return -1L
    val sink = mk(d.width, d.height)
    if (sink == null) return -1L
    if (d.nc == 1) {
      val plane = d.grayPlane
      val stride = d.grayStride
      var y = 0
      while (y < d.height) {
        var x = 0
        while (x < d.width) {
          val g = plane(y * stride + x)
          sink.pixel(x, y, g, g, g, -1)
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < d.height) {
        var x = 0
        while (x < d.width) {
          val (r, g, bl) = d.pixel(x, y)
          sink.pixel(x, y, r, g, bl, -1)
          x += 1
        }
        y += 1
      }
    }
    (d.width.toLong << 32) | (d.height.toLong & 0xffffffffL)
  }

  /** Test-facing full decode to packed 0xRRGGBB pixels (row-major), for
    * golden comparison against an independent codec. Throws on
    * malformed input (specs want the error, the gate path does not).
    */
  def rgb(b: Array[Byte]): (Int, Int, Array[Int]) = {
    val d = decode(b).getOrElse(throw new IllegalArgumentException("undecodable"))
    val out = new Array[Int](d.width * d.height)
    var y = 0
    while (y < d.height) {
      var x = 0
      while (x < d.width) {
        val (r, g, bl) = d.pixel(x, y)
        out(y * d.width + x) = (r << 16) | (g << 8) | bl
        x += 1
      }
      y += 1
    }
    (d.width, d.height, out)
  }

  // per-component state gathered from SOF/SOS
  private final class Comp {
    var id = 0
    var h = 1; var v = 1; var tq = 0
    var dcTab = 0; var acTab = 0
    var pred = 0
    var wb = 0; var hb = 0 // plane size in blocks (MCU-padded grid)
    var wbc = 0; var hbc = 0 // non-interleaved block grid (actual size)
    var plane: Array[Int] = null
    var coefZ: Array[Int] = null // progressive: per-block zigzag coefficients
  }

  /** Decoded component planes + geometry; pixel() applies upsampling and
    * color conversion on demand.
    */
  private[plans] final class Decoded(
      val width: Int, val height: Int, val nc: Int,
      comps: Array[Comp], hMax: Int, vMax: Int) {
    /** Gray fast-path accessors (nc == 1 only). */
    def grayPlane: Array[Int] = comps(0).plane
    def grayStride: Int = comps(0).wb * 8
    def pixel(x: Int, y: Int): (Int, Int, Int) =
      if (nc == 1) {
        val g = comps(0).plane(y * comps(0).wb * 8 + x)
        (g, g, g)
      } else {
        val cy = comps(0); val cb = comps(1); val cr = comps(2)
        val yy = cy.plane((y * cy.v / vMax) * cy.wb * 8 + x * cy.h / hMax)
        val pb = cb.plane((y * cb.v / vMax) * cb.wb * 8 + x * cb.h / hMax) - 128
        val pr = cr.plane((y * cr.v / vMax) * cr.wb * 8 + x * cr.h / hMax) - 128
        (clamp(Math.round(yy + 1.402 * pr).toInt),
          clamp(Math.round(yy - 0.344136 * pb - 0.714136 * pr).toInt),
          clamp(Math.round(yy + 1.772 * pb).toInt))
      }
  }

  private def parseOrThrow(b: Array[Byte]): InternalRow = {
    val d = decode(b).orNull
    if (d == null) return nulls()
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var peak = 0
    if (d.nc == 1) {
      // gray fast path: one plane read per pixel, no per-pixel tuple —
      // this loop dominates the gate/bench cost of the decode queries
      val plane = d.grayPlane
      val stride = d.grayStride
      var y = 0
      while (y < d.height) {
        val row = y * stride
        var x = 0
        while (x < d.width) {
          val g = plane(row + x)
          sumR += g
          if (g > peak) peak = g
          x += 1
        }
        y += 1
      }
      sumG = sumR; sumB = sumR
    } else {
      var y = 0
      while (y < d.height) {
        var x = 0
        while (x < d.width) {
          val (r, g, bl) = d.pixel(x, y)
          sumR += r; sumG += g; sumB += bl
          if (r > peak) peak = r
          if (g > peak) peak = g
          if (bl > peak) peak = bl
          x += 1
        }
        y += 1
      }
    }
    val out = new GenericInternalRow(8)
    out.setInt(0, d.width)
    out.setInt(1, d.height)
    out.setInt(2, d.nc)
    out.setLong(3, d.width.toLong * d.height)
    out.setLong(4, sumR)
    out.setLong(5, sumG)
    out.setLong(6, sumB)
    out.setInt(7, peak)
    out
  }

  private def decode(b: Array[Byte]): Option[Decoded] = {
    if (b == null || b.length < 4 ||
      (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val qt = new Array[Array[Int]](4)
    val dcH = new Array[Huff](4)
    val acH = new Array[Huff](4)
    var width = 0; var height = 0; var nc = 0
    var comps: Array[Comp] = null
    var restartInterval = 0
    var sofSeen = false
    var progressive = false
    var allocated = false
    var anyScan = false
    var hMax = 1; var vMax = 1
    var mcusX = 0; var mcusY = 0

    def allocate(): Boolean = {
      comps.foreach { c => if (c.h > hMax) hMax = c.h; if (c.v > vMax) vMax = c.v }
      mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      // TOTAL budget across components, coefficient stores included — a
      // per-component cap alone lets a crafted 3-component SOF2 with a
      // huge claimed geometry commit ~800 MB per row before any entropy
      // data is read (an executor-OOM lever on adversarial crawl blobs).
      // 4×MaxPixels ints (256 MB) admits every real sampling layout at
      // the pixel cap except full-res-chroma progressive, which it
      // bounds to ~10M pixels.
      val budget = MaxPixels.toLong * 4L
      var totalInts = 0L
      var i = 0
      while (i < comps.length) {
        val c = comps(i)
        c.wb = mcusX * c.h; c.hb = mcusY * c.v
        // non-interleaved grid: blocks covering the component's ACTUAL
        // size (T.81 A.2.2), not the MCU-padded grid
        c.wbc = ((width * c.h + hMax - 1) / hMax + 7) / 8
        c.hbc = ((height * c.v + vMax - 1) / vMax + 7) / 8
        // Long math: a crafted SOF can make wb*8*hb*8 overflow Int.
        val n = c.wb.toLong * 8L * c.hb.toLong * 8L
        if (n > MaxPixels.toLong * 2L) return false
        totalInts += (if (progressive) n * 2L else n)
        if (totalInts > budget) return false
        c.plane = new Array[Int](n.toInt)
        if (progressive) c.coefZ = new Array[Int](n.toInt) // wb*hb*64 == n
        i += 1
      }
      allocated = true
      true
    }

    var p = 2
    var done = false
    while (!done && p + 2 <= b.length) {
      if ((b(p) & 0xff) != 0xff) return None
      val m = b(p + 1) & 0xff
      if (m == 0xff) p += 1 // fill byte
      else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { p += 2 }
      else if (m == 0xd9) done = true // EOI
      else {
        if (p + 4 > b.length) return None
        val len = be16(b, p + 2)
        val seg = p + 4
        val segEnd = p + 2 + len
        if (len < 2 || segEnd > b.length) return None
        var nextP = segEnd
        m match {
          case 0xdb => // DQT — one or more tables, 8- or 16-bit entries
            var q = seg
            while (q < segEnd) {
              val pq = (b(q) & 0xff) >> 4
              val tq = b(q) & 0x0f
              q += 1
              val tab = new Array[Int](64)
              var i = 0
              while (i < 64) {
                tab(i) = if (pq == 1) { val v = be16(b, q); q += 2; v }
                else { val v = b(q) & 0xff; q += 1; v }
                i += 1
              }
              qt(tq) = tab
            }
          case 0xc4 => // DHT — one or more tables (progressive streams
            // legally redefine tables between scans)
            var q = seg
            while (q < segEnd) {
              val tc = (b(q) & 0xff) >> 4
              val th = b(q) & 0x0f
              q += 1
              val bits = new Array[Int](17)
              var total = 0
              var i = 1
              while (i <= 16) { bits(i) = b(q + i - 1) & 0xff; total += bits(i); i += 1 }
              q += 16
              val vals = new Array[Byte](total)
              System.arraycopy(b, q, vals, 0, total)
              q += total
              val h = new Huff(bits, vals)
              if (tc == 0) dcH(th) = h else acH(th) = h
            }
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/SOF1 baseline, SOF2 progressive
            if (sofSeen) return None
            if ((b(seg) & 0xff) != 8) return None // 8-bit precision only
            height = be16(b, seg + 1)
            width = be16(b, seg + 3)
            nc = b(seg + 5) & 0xff
            if (width <= 0 || height <= 0 || (nc != 1 && nc != 3)) return None
            // Untrusted header: reject huge claimed geometries BEFORE any
            // allocation (crawl blobs are adversarial; mirrors PngPixels'
            // 1<<24 pixel cap and keeps plane sizes safely inside Int).
            if (width.toLong * height.toLong > MaxPixels) return None
            progressive = m == 0xc2
            comps = Array.fill(nc)(new Comp)
            var i = 0
            while (i < nc) {
              val o = seg + 6 + 3 * i
              comps(i).id = b(o) & 0xff
              comps(i).h = (b(o + 1) & 0xff) >> 4
              comps(i).v = b(o + 1) & 0x0f
              comps(i).tq = b(o + 2) & 0xff
              if (comps(i).h < 1 || comps(i).h > 4 || comps(i).v < 1 || comps(i).v > 4)
                return None
              i += 1
            }
            sofSeen = true
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // lossless / arithmetic / hierarchical: unsupported
          case 0xdd => restartInterval = be16(b, seg)
          case 0xda => // SOS
            if (!sofSeen) return None
            if (!allocated && !allocate()) return None
            val ns = b(seg) & 0xff
            if (ns < 1 || ns > nc) return None
            val scanComps = new Array[Comp](ns)
            var i = 0
            while (i < ns) {
              val cs = b(seg + 1 + 2 * i) & 0xff
              val tt = b(seg + 2 + 2 * i) & 0xff
              // match the SOS component selector to the SOF id; fall
              // back to position when ids are unusual
              var idx = -1
              var j = 0
              while (j < nc && idx < 0) { if (comps(j).id == cs) idx = j; j += 1 }
              if (idx < 0) idx = if (i < nc) i else return None
              comps(idx).dcTab = tt >> 4
              comps(idx).acTab = tt & 0x0f
              scanComps(i) = comps(idx)
              i += 1
            }
            val ss = b(seg + 1 + 2 * ns) & 0xff
            val se = b(seg + 2 + 2 * ns) & 0xff
            val ahal = b(seg + 3 + 2 * ns) & 0xff
            val ah = ahal >> 4; val al = ahal & 0x0f

            if (!progressive) {
              if (ns != nc) return None // baseline non-interleaved: unsupported
              return baselineScan(b, segEnd, comps, qt, dcH, acH,
                restartInterval, mcusX, mcusY, width, height, nc, hMax, vMax)
            }
            if (ss > 63 || se > 63 || se < ss || (ss == 0 && se != 0) ||
              (ss > 0 && ns != 1)) return None
            val after = progressiveScan(b, segEnd, scanComps, qt, dcH, acH,
              restartInterval, mcusX, mcusY, ss, se, ah, al)
            if (after < 0) return None
            anyScan = true
            nextP = after
          case _ => // APPn, COM, others: skip
        }
        p = nextP
      }
    }
    if (!progressive || !anyScan) return None

    // finalize: dequantize each component's accumulated coefficients and
    // IDCT every block of the padded grid into the pixel plane
    val coef = new Array[Int](64)
    val pix = new Array[Int](64)
    var ci = 0
    while (ci < nc) {
      val c = comps(ci)
      val q = qt(c.tq)
      if (q == null) return None
      val cz = c.coefZ
      val pw = c.wb * 8
      var by = 0
      while (by < c.hb) {
        var bx = 0
        while (bx < c.wb) {
          val off = (by * c.wb + bx) * 64
          var k = 0
          while (k < 64) { coef(Zigzag(k)) = cz(off + k) * q(k); k += 1 }
          idct(coef, pix)
          val bx0 = bx * 8; val by0 = by * 8
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              c.plane((by0 + y) * pw + bx0 + x) = pix(y * 8 + x)
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    Some(new Decoded(width, height, nc, comps, hMax, vMax))
  }

  /** The proven baseline path: single interleaved scan, immediate
    * dequantize + IDCT per block. Returns the finished image.
    */
  private def baselineScan(b: Array[Byte], scanStart: Int, comps: Array[Comp],
      qt: Array[Array[Int]], dcH: Array[Huff], acH: Array[Huff],
      restartInterval: Int, mcusX: Int, mcusY: Int,
      width: Int, height: Int, nc: Int, hMax: Int, vMax: Int): Option[Decoded] = {
    val rd = new Reader(b, scanStart)
    val coef = new Array[Int](64)
    val pix = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!rd.restart()) return None
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < nc) {
        val c = comps(ci)
        val dct = dcH(c.dcTab); val act = acH(c.acTab); val q = qt(c.tq)
        if (dct == null || act == null || q == null) return None
        var bv = 0
        while (bv < c.v) {
          var bh = 0
          while (bh < c.h) {
            // entropy-decode one block into natural-order coefficients
            java.util.Arrays.fill(coef, 0)
            val t = rd.decode(dct)
            val diff = extend(rd.receive(t), t)
            c.pred += diff
            coef(0) = c.pred * q(0)
            var k = 1
            var done = false
            while (!done && k < 64) {
              val rs = rd.decode(act)
              val r = rs >> 4; val s = rs & 0x0f
              if (s == 0) { if (r == 15) k += 16 else done = true }
              else {
                k += r
                if (k > 63) return None
                coef(Zigzag(k)) = extend(rd.receive(s), s) * q(k)
                k += 1
              }
            }
            idct(coef, pix)
            // place block at (mx*c.h + bh, my*c.v + bv) in the plane
            val bx0 = (mx * c.h + bh) * 8
            val by0 = (my * c.v + bv) * 8
            val pw = c.wb * 8
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                c.plane((by0 + y) * pw + bx0 + x) = pix(y * 8 + x)
                x += 1
              }
              y += 1
            }
            bh += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }
    Some(new Decoded(width, height, nc, comps, hMax, vMax))
  }

  /** One progressive scan (T.81 G.2): DC first/refine (interleaved or
    * single-component) and AC first/refine with EOB-run coding
    * (single-component, non-interleaved block order). Accumulates into
    * each component's zigzag coefficient store; returns the byte offset
    * of the next marker, or -1 on corruption.
    */
  private def progressiveScan(b: Array[Byte], scanStart: Int,
      scanComps: Array[Comp], qt: Array[Array[Int]],
      dcH: Array[Huff], acH: Array[Huff], restartInterval: Int,
      mcusX: Int, mcusY: Int, ss: Int, se: Int, ah: Int, al: Int): Int = {
    val rd = new Reader(b, scanStart)
    var eobrun = 0
    val p1 = 1 << al

    // AC refinement for one block: corrects nonzero-history coefficients
    // and inserts newly-significant ones (T.81 G.1.2.3 / the classic
    // decode_mcu_AC_refine structure, reimplemented from the spec)
    def refineAc(cz: Array[Int], off: Int): Boolean = {
      val act = acH(scanComps(0).acTab)
      var k = ss
      if (eobrun == 0) {
        var break = false
        while (k <= se && !break) {
          val rs = rd.decode(act)
          var r = rs >> 4
          val s = rs & 0x0f
          var insert = 0
          if (s == 0) {
            if (r != 15) {
              // EOB run INCLUDES this block; the sweep below consumes it
              eobrun = (1 << r)
              if (r > 0) eobrun += rd.receive(r)
              break = true
            }
            // r == 15: ZRL — skip 16 zero-history positions
          } else {
            if (s != 1) return false // refinement amplitudes are ±1
            insert = if (rd.nextBit() == 1) p1 else -p1
          }
          if (!break) {
            var placed = false
            while (k <= se && !placed) {
              val v = cz(off + k)
              if (v != 0) {
                if (rd.nextBit() == 1 && (v & p1) == 0)
                  cz(off + k) = if (v >= 0) v + p1 else v - p1
              } else {
                if (r == 0) {
                  if (insert != 0) cz(off + k) = insert
                  placed = true
                } else r -= 1
              }
              k += 1
            }
            if (!placed && insert != 0) return false // ran off the band
          }
        }
      }
      if (eobrun > 0) {
        // this block is one of the EOB-run blocks: correction bits still
        // appear for every remaining nonzero-history coefficient
        while (k <= se) {
          val v = cz(off + k)
          if (v != 0) {
            if (rd.nextBit() == 1 && (v & p1) == 0)
              cz(off + k) = if (v >= 0) v + p1 else v - p1
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    // first AC scan for one block (Ah == 0)
    def firstAc(cz: Array[Int], off: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = rd.decode(acH(scanComps(0).acTab))
        val r = rs >> 4
        val s = rs & 0x0f
        if (s == 0) {
          if (r == 15) k += 16
          else {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += rd.receive(r)
            return true
          }
        } else {
          k += r
          if (k > se) return false
          cz(off + k) = extend(rd.receive(s), s) << al
          k += 1
        }
      }
      true
    }

    if (ss == 0) {
      // DC scan — interleaved over the MCU grid when several components
      // participate; single-component grids otherwise
      scanComps.foreach(_.pred = 0)
      if (scanComps.length > 1) {
        // multi-component DC scans interleave over the MCU grid; a
        // single-component scan is ALWAYS non-interleaved (T.81 A.2.2)
        // MCU-interleaved traversal (matches baseline geometry)
        var mcu = 0
        val nMcus = mcusX * mcusY
        while (mcu < nMcus) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            if (!rd.restart()) return -1
            scanComps.foreach(_.pred = 0)
            eobrun = 0
          }
          val mx = mcu % mcusX
          val my = mcu / mcusX
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            var bv = 0
            while (bv < c.v) {
              var bh = 0
              while (bh < c.h) {
                val blk = (my * c.v + bv) * c.wb + (mx * c.h + bh)
                val off = blk * 64
                if (ah == 0) {
                  if (dcH(c.dcTab) == null) return -1
                  val t = rd.decode(dcH(c.dcTab))
                  val diff = extend(rd.receive(t), t)
                  c.pred += diff
                  c.coefZ(off) = c.pred << al
                } else {
                  if (rd.nextBit() == 1) c.coefZ(off) |= p1
                }
                bh += 1
              }
              bv += 1
            }
            ci += 1
          }
          mcu += 1
        }
      } else {
        val c = scanComps(0)
        if (ah == 0 && dcH(c.dcTab) == null) return -1
        var blkNo = 0
        var by = 0
        while (by < c.hbc) {
          var bx = 0
          while (bx < c.wbc) {
            if (restartInterval > 0 && blkNo > 0 && blkNo % restartInterval == 0) {
              if (!rd.restart()) return -1
              c.pred = 0; eobrun = 0
            }
            val off = (by * c.wb + bx) * 64
            if (ah == 0) {
              val t = rd.decode(dcH(c.dcTab))
              val diff = extend(rd.receive(t), t)
              c.pred += diff
              c.coefZ(off) = c.pred << al
            } else {
              if (rd.nextBit() == 1) c.coefZ(off) |= p1
            }
            blkNo += 1
            bx += 1
          }
          by += 1
        }
      }
    } else {
      // AC scan: exactly one component, non-interleaved block order
      val c = scanComps(0)
      if (acH(c.acTab) == null) return -1
      var blkNo = 0
      var by = 0
      while (by < c.hbc) {
        var bx = 0
        while (bx < c.wbc) {
          if (restartInterval > 0 && blkNo > 0 && blkNo % restartInterval == 0) {
            if (!rd.restart()) return -1
            eobrun = 0
          }
          val off = (by * c.wb + bx) * 64
          val ok = if (ah == 0) firstAc(c.coefZ, off) else refineAc(c.coefZ, off)
          if (!ok) return -1
          blkNo += 1
          bx += 1
        }
        by += 1
      }
    }

    // byte-align and locate the next marker (skipping stuffed FF00 runs
    // is already done by the reader; from its position, the next two
    // bytes must start a marker, possibly after FF fill bytes)
    var q = rd.p
    while (q + 1 < b.length &&
      !((b(q) & 0xff) == 0xff && (b(q + 1) & 0xff) != 0x00)) q += 1
    if (q + 1 >= b.length) b.length else q
  }

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Separable 2-D IDCT + level shift + clamp: natural-order coef →
    * 8×8 pixels. Double-precision basis; the ±0.5 rounding boundary is
    * what the spec's ±1 ImageIO tolerance absorbs on real photos, while
    * DC-only blocks (the gated plant) land exactly.
    */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    // rows: for each vertical frequency v, transform the 8 horizontal freqs
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(v * 8 + u) * Cos(x)(u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    // columns
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += tmp(vv * 8 + x) * Cos(y)(vv); vv += 1 }
        out(y * 8 + x) = clamp(Math.round(s).toInt + 128)
        y += 1
      }
      x += 1
    }
  }
}
