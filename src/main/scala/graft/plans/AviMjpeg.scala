package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructType}

/** REAL video frame decode for the codec that needs no codec library:
  * MJPEG-in-AVI (every frame an independent baseline JPEG — the format
  * IP cameras and capture hardware actually emit). This retires the
  * "video decode" stub for a genuine codec family: the RIFF/AVI
  * container walk (LIST recursion to `movi`, `00dc`/`00db` frame
  * chunks, even-byte padding) feeds each frame through the full
  * [[JpegPixels]] entropy/Huffman/IDCT pipeline and folds per-stream
  * stats: frame count, fixed geometry, total pixels, brightness sum,
  * global peak — the per-stream aggregate a video quality filter cuts
  * on (black/blank detection, exposure routing) without materializing
  * rasters. Inter-frame-predicted codecs (H.264/HEVC) remain the
  * declared swap point — THEIR entropy decode genuinely needs a codec
  * library; the container walk and per-frame fold here are exactly what
  * such a decoder would plug into.
  *
  * Frames that fail to decode are COUNTED (n_bad) rather than failing
  * the stream — a real camera shard has torn frames. Per-row,
  * shuffle-free, whole-stage codegen.
  */
case class AviFrames(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"avi_frames requires binary, got $t")
    }

  override def dataType: DataType = AviFrames.Schema
  override def prettyName: String = "avi_frames"

  override def nullSafeEval(input: Any): Any =
    AviFrames.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.AviFrames.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AviFrames {

  val Schema: StructType = new StructType()
    .add("n_frames", IntegerType)
    .add("n_bad", IntegerType)
    .add("width", IntegerType)
    .add("height", IntegerType)
    .add("n_pixels", LongType)
    .add("sum_gray", LongType)
    .add("peak", IntegerType)

  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], p: Int, t: String): Boolean =
    p + 4 <= b.length && b(p) == t.charAt(0) && b(p + 1) == t.charAt(1) &&
      b(p + 2) == t.charAt(2) && b(p + 3) == t.charAt(3)

  private def nulls(): InternalRow = {
    val r = new GenericInternalRow(7)
    var i = 0; while (i < 7) { r.setNullAt(i); i += 1 }
    r
  }

  /** Static so generated code calls it directly. Never null, never throws. */
  def parse(b: Array[Byte]): InternalRow =
    try parseOrThrow(b) catch { case scala.util.control.NonFatal(_) => nulls() }

  /** The RIFF/AVI frame walk factored as a VISITOR (the
    * [[PngPixels.walk]] discipline — one container walk, many
    * consumers: stats fold here, the video fingerprint in
    * [[AviDhash]]): `onFrame(payloadOffset, length)` fires for every
    * `##dc`/`##db` chunk inside `movi`, in stream order. Returns false
    * when the bytes are not a RIFF/AVI container at all.
    */
  private[plans] def frames(b: Array[Byte])(onFrame: (Int, Int) => Unit): Boolean = {
    if (b == null || b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "AVI "))
      return false
    // chunk walk; recurse only into LIST boxes (hdrl/strl skipped as a
    // group unless they are movi)
    def walk(from: Int, to: Int, inMovi: Boolean, depth: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val size = le32(b, p + 4)
        val payload = p + 8
        val end = payload.toLong + size
        if (end > to || size < 0) return
        if (tag(b, p, "LIST") && payload + 4 <= to && depth < 8) {
          val isMovi = tag(b, payload, "movi")
          walk(payload + 4, end.toInt, inMovi || isMovi, depth + 1)
        } else if (inMovi && size > 0 && payload + size <= to &&
          (b(p + 2) == 'd' && (b(p + 3) == 'c' || b(p + 3) == 'b'))) {
          onFrame(payload, size.toInt) // ##dc compressed / ##db uncompressed slot
        }
        val next = end + (size & 1L) // even-byte padding
        if (next <= p) return
        p = next.toInt
      }
    }
    walk(12, b.length, inMovi = false, 0)
    true
  }

  private def parseOrThrow(b: Array[Byte]): InternalRow = {
    var nFrames = 0; var nBad = 0
    var width = -1; var height = -1
    var nPixels = 0L; var sumGray = 0L; var peak = 0

    val isAvi = frames(b) { (payload, len) =>
      val fb = java.util.Arrays.copyOfRange(b, payload, payload + len)
      val row = JpegPixels.parse(fb)
      nFrames += 1
      if (row.isNullAt(0)) nBad += 1
      else {
        if (width < 0) { width = row.getInt(0); height = row.getInt(1) }
        nPixels += row.getLong(3)
        sumGray += row.getLong(4) // gray: sum_r == sum_g == sum_b
        val p = row.getInt(7)
        if (p > peak) peak = p
      }
    }
    if (!isAvi) return nulls()

    val r = new GenericInternalRow(7)
    r.setInt(0, nFrames)
    r.setInt(1, nBad)
    if (width >= 0) r.setInt(2, width) else r.setNullAt(2)
    if (height >= 0) r.setInt(3, height) else r.setNullAt(3)
    r.setLong(4, nPixels)
    r.setLong(5, sumGray)
    r.setInt(6, peak)
    r
  }
}

/** Deterministic MJPEG/AVI planting: a RIFF/AVI container (avih + strl
  * headers with 'MJPG' fourcc, LIST movi) holding `2 + docId % 3`
  * DC-exact frames from [[JpegPlant.encodeFrame]] — shared geometry,
  * per-frame salted content, odd-length frames exercising the RIFF
  * even-byte padding rule. A JUNK chunk sits before movi so the walk
  * must skip non-LIST data, and the movi list also carries a `01wb`
  * audio chunk the video fold must ignore.
  */
case class AviPlant(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"avi_plant requires bigint, got $t")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "avi_plant"

  override def nullSafeEval(input: Any): Any =
    AviPlant.encode(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.AviPlant.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AviPlant {

  def framesOf(docId: Long): Int = (2 + docId % 3).toInt

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
    id.getBytes ++ le32(payload.length) ++ payload ++ pad
  }
  private def list(kind: String, inner: Array[Byte]): Array[Byte] =
    chunk("LIST", kind.getBytes ++ inner)

  /** Static so generated code calls it directly. */
  def encode(docId: Long): Array[Byte] =
    encodeSeq(docId, framesOf(docId), 0)

  /** Generalized plant: `nf` frames whose frame slot f carries the
    * content of salt (salt0 + f) — [[JpegPlant.encodeFrame]]'s per-frame
    * arithmetic with a shifted start, so a (salt0 = 1, nf − 1)-frame
    * plant IS the front-trimmed twin of the (salt0 = 0, nf)-frame one:
    * the closed-form fixture for trim-tolerant video matching. Container
    * framing (JUNK, audio chunk, odd-length padding) identical to
    * [[encode]].
    */
  def encodeSeq(docId: Long, nf: Int, salt0: Int): Array[Byte] = {
    val w = JpegPlant.widthBlocksOf(docId) * 8
    val h = JpegPlant.heightBlocksOf(docId) * 8
    val avih = le32(33333L) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
      le32(nf) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ new Array[Byte](16)
    val strh = "vids".getBytes ++ "MJPG".getBytes ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(1) ++ le32(30) ++ le32(0) ++ le32(nf) ++ le32(0) ++
      le32(0xffffffffL) ++ le32(0) ++ new Array[Byte](8)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++
      Array[Byte](1, 0, 24, 0) ++ "MJPG".getBytes ++
      le32(w.toLong * h * 3) ++ new Array[Byte](16)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val junk = chunk("JUNK", Array.fill[Byte](11)(0x4a)) // odd size → padded
    val frames = (0 until nf).flatMap { f =>
      chunk("00dc", JpegPlant.encodeFrame(docId, salt0 + f)) ++
        (if (f == 0) chunk("01wb", Array.fill[Byte](6)(0x55)) else Array.empty[Byte])
    }.toArray
    val movi = list("movi", frames)
    val body = "AVI ".getBytes ++ hdrl ++ junk ++ movi
    "RIFF".getBytes ++ le32(body.length) ++ body
  }
}

/** `avi_plant_seq(seed, fBase, fMod, salt0, drop)` — the parameterized
  * planting twin for the LONG-video and TRIM-tolerance gates: a real
  * MJPEG/AVI stream of `fBase + seed % fMod − drop` frames whose frame
  * slot f carries salt (salt0 + f) content (see
  * [[AviPlant.encodeSeq]]). With (salt0 = 1, drop = 1) the plant is the
  * exact front-trimmed twin of the (0, 0) stream — same geometry, one
  * frame shorter, every remaining frame bit-identical.
  */
case class AviPlantSeq(child: Expression, fBase: Int, fMod: Int,
                       salt0: Int, drop: Int) extends UnaryExpression {
  require(fBase - drop >= 1 && fMod >= 1, s"bad frame range: $fBase % $fMod - $drop")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"avi_plant_seq requires bigint, got $t")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "avi_plant_seq"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[Long]
    AviPlant.encodeSeq(s, (fBase + s % fMod).toInt - drop, salt0)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.AviPlant.encodeSeq($c, (int)($fBase + $c % $fMod) - $drop, $salt0)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `avi_dhash(content, gw, gh)` — the VIDEO perceptual fingerprint:
  * every MJPEG frame through the shared [[JpegPixels.walk]] visitor
  * into the one [[DhashCore]] grid, producing (width, height,
  * n_frames, sig) with `sig(f)` = frame f's gw×gh difference hash in
  * stream order. Near-identical videos (re-encodes, container
  * rewraps, brightness-preserving edits) differ in a few signature
  * bits; any torn/sub-grid frame or geometry drift nulls the WHOLE
  * struct — a fingerprint demands a clean stream (quality triage of
  * dirty streams is [[AviFrames]]' job, which counts bad frames
  * instead). Per-row, shuffle-free, static-call codegen; memory is
  * one frame's grid, never a raster.
  */
case class AviDhash(child: Expression, gw: Int, gh: Int) extends UnaryExpression {
  require(gw >= 1 && gh >= 1 && gw.toLong * gh <= 64,
    s"dhash grid must fit 64 bits, got ${gw}x$gh")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"avi_dhash requires binary, got $t")
    }

  override def dataType: DataType = AviDhash.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "avi_dhash"

  override def nullSafeEval(input: Any): Any =
    AviDhash.compute(input.asInstanceOf[Array[Byte]], gw, gh)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("vdh")
      s"""InternalRow $r = graft.plans.AviDhash.compute($c, $gw, $gh);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AviDhash {

  val Schema: StructType = new StructType()
    .add("width", IntegerType)
    .add("height", IntegerType)
    .add("n_frames", IntegerType)
    .add("sig", org.apache.spark.sql.types.ArrayType(LongType, containsNull = false))

  /** Static for codegen. Null = not AVI, no frames, or any frame
    * malformed / sub-grid / geometry-drifted.
    */
  def compute(b: Array[Byte], gw: Int, gh: Int): InternalRow = {
    val hashes = new scala.collection.mutable.ArrayBuffer[Long](8)
    var w = -1; var h = -1
    var bad = false
    val isAvi = AviFrames.frames(b) { (payload, len) =>
      if (!bad) {
        val fb = java.util.Arrays.copyOfRange(b, payload, payload + len)
        val row = JpegDhash.compute(fb, gw, gh)
        if (row == null) bad = true
        else {
          val fw = row.getInt(0); val fh = row.getInt(1)
          if (w < 0) { w = fw; h = fh }
          if (fw != w || fh != h) bad = true
          else hashes += row.getLong(2)
        }
      }
    }
    if (!isAvi || bad || hashes.isEmpty) return null
    val out = new GenericInternalRow(4)
    out.setInt(0, w); out.setInt(1, h); out.setInt(2, hashes.length)
    out.update(3, org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hashes.toArray))
    out
  }
}
