package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructType}

/** Real video-container header decode — ISO BMFF (MP4/MOV) box walk →
  * (timescale, duration, n_tracks, track_id, width, height, handler) —
  * the video twin of [[WavHeader]]/[[ImageHeader]]: pure JVM byte
  * inspection, no codec library. The fields a video pipeline filters on
  * first (duration caps via duration/timescale, resolution routing,
  * track counting, vide-vs-soun handler split) all live in the `moov`
  * header tree; frame decode proper stays behind the documented stub
  * ([[graft.multimodal.Multimodal]] — reference: media_etl read paths).
  *
  * Box contract (all big-endian, per ISO/IEC 14496-12): a file is a
  * sequence of boxes (u32 size, 4-byte type, payload); size==1 switches
  * to a u64 largesize after the type, size==0 means "to end of file".
  * Container boxes (`moov`, `trak`, `mdia`) hold child boxes in their
  * payload — the walk RECURSES, it does not scan flat. Full boxes
  * (`mvhd`, `tkhd`, `mdhd`, `hdlr`) carry (version, flags) and widen
  * their time fields to u64 at version 1, so both layouts must parse.
  * tkhd width/height are 16.16 fixed point — the integer part is
  * reported.
  *
  * Unrecognized/truncated payloads yield nulls inside the struct (never
  * a null struct) so failure counts group cleanly. Per-row, shuffle-free,
  * whole-stage codegen.
  */
case class Mp4Header(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"mp4_header requires binary, got $t")
    }

  override def dataType: DataType = Mp4Header.Schema
  override def prettyName: String = "mp4_header"

  override def nullSafeEval(input: Any): Any =
    Mp4Header.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Mp4Header.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp4Header {

  val Schema: StructType = new StructType()
    .add("timescale", LongType)
    .add("duration", LongType)
    .add("n_tracks", IntegerType)
    .add("track_id", LongType)
    .add("width", IntegerType)
    .add("height", IntegerType)
    .add("handler", org.apache.spark.sql.types.StringType)

  private def be16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
  private def be64(b: Array[Byte], p: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
    v
  }
  private def tag(b: Array[Byte], p: Int, t: String): Boolean =
    b(p) == t.charAt(0) && b(p + 1) == t.charAt(1) &&
      b(p + 2) == t.charAt(2) && b(p + 3) == t.charAt(3)

  private final class Acc {
    var timescale: Long = -1L
    var duration: Long = -1L
    var nTracks: Int = 0
    var trackId: Long = -1L
    var width: Int = -1
    var height: Int = -1
    var handler: String = null
  }

  /** Walk the boxes in b[from, to); recurse into container boxes. The
    * FIRST trak supplies the reported track fields (later traks only
    * bump the count) — planted files put the video trak first, matching
    * encoder convention; a muxed file with audio first reports the
    * audio track, which the handler column makes visible to callers.
    */
  private def walk(b: Array[Byte], from: Int, to: Int, depth: Int, acc: Acc): Unit = {
    var p = from
    while (p >= 0 && p + 8 <= to) {
      val size32 = be32(b, p)
      var payload = p + 8
      // size==1 → u64 largesize follows the type; size==0 → to end
      val boxEnd: Long =
        if (size32 == 1L) {
          if (p + 16 > to) return
          payload = p + 16
          p.toLong + be64(b, p + 8)
        } else if (size32 == 0L) to.toLong
        else p.toLong + size32
      if (boxEnd > to || boxEnd <= p) return
      val end = boxEnd.toInt
      if (depth < 8) {
        if (tag(b, p + 4, "moov") || tag(b, p + 4, "mdia")) {
          walk(b, payload, end, depth + 1, acc)
        } else if (tag(b, p + 4, "trak")) {
          acc.nTracks += 1
          // only the FIRST trak reports; later traks still count
          val first = acc.trackId < 0
          if (first) walk(b, payload, end, depth + 1, acc)
          else {
            val keep = (acc.trackId, acc.width, acc.height, acc.handler)
            walk(b, payload, end, depth + 1, acc)
            acc.trackId = keep._1; acc.width = keep._2
            acc.height = keep._3; acc.handler = keep._4
          }
        } else if (tag(b, p + 4, "mvhd") && payload + 4 <= end) {
          val version = b(payload) & 0xff
          if (version == 1 && payload + 4 + 28 <= end) {
            acc.timescale = be32(b, payload + 4 + 16)
            acc.duration = be64(b, payload + 4 + 20)
          } else if (version == 0 && payload + 4 + 16 <= end) {
            acc.timescale = be32(b, payload + 4 + 8)
            acc.duration = be32(b, payload + 4 + 12)
          }
        } else if (tag(b, p + 4, "tkhd") && payload + 4 <= end) {
          val version = b(payload) & 0xff
          // v0: times u32×2, id, res, dur u32; v1: times u64×2, id, res, dur u64
          val idOff = if (version == 1) payload + 4 + 16 else payload + 4 + 8
          val afterDur = if (version == 1) idOff + 16 else idOff + 12
          // layer(2) altgroup(2) volume(2) reserved(2) matrix(36) → width
          val whOff = afterDur + 8 + 2 + 2 + 2 + 2 + 36
          if (whOff + 8 <= end) {
            acc.trackId = be32(b, idOff)
            acc.width = (be32(b, whOff) >>> 16).toInt
            acc.height = (be32(b, whOff + 4) >>> 16).toInt
          }
        } else if (tag(b, p + 4, "hdlr") && payload + 12 <= end) {
          // version/flags(4) predefined(4) handler_type(4)
          val h = new Array[Byte](4)
          System.arraycopy(b, payload + 8, h, 0, 4)
          acc.handler = new String(h, java.nio.charset.StandardCharsets.US_ASCII)
        }
      }
      p = if (end <= p) -1 else end
    }
  }

  /** Static so generated code calls it directly. Never null, never throws. */
  def parse(b: Array[Byte]): InternalRow = {
    val r = new GenericInternalRow(7)
    val ok = b != null && b.length >= 12 && tag(b, 4, "ftyp")
    if (!ok) {
      var i = 0; while (i < 7) { r.setNullAt(i); i += 1 }
      return r
    }
    val acc = new Acc
    walk(b, 0, b.length, 0, acc)
    if (acc.timescale >= 0) r.setLong(0, acc.timescale) else r.setNullAt(0)
    if (acc.duration >= 0) r.setLong(1, acc.duration) else r.setNullAt(1)
    r.setInt(2, acc.nTracks)
    if (acc.trackId >= 0) r.setLong(3, acc.trackId) else r.setNullAt(3)
    if (acc.width >= 0) r.setInt(4, acc.width) else r.setNullAt(4)
    if (acc.height >= 0) r.setInt(5, acc.height) else r.setNullAt(5)
    if (acc.handler != null)
      r.update(6, org.apache.spark.unsafe.types.UTF8String.fromString(acc.handler))
    else r.setNullAt(6)
    r
  }
}
