package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Real image-container header decode — magic bytes → (format, width,
  * height, channels) — as ONE codegen'd expression over a `binary`
  * payload column. Pure JVM byte inspection, no codec libraries: the
  * dimensions and channel count live in the container HEADER (PNG IHDR,
  * GIF logical screen descriptor, JPEG SOF frame segment), so the
  * first-line metadata a media pipeline filters on (resolution caps,
  * aspect-ratio sanity, grayscale-vs-RGB routing) needs no pixel decode
  * at all. This closes the decode half of the multimodal story
  * ([[graft.multimodal.Multimodal]]): header fields are REAL parsing;
  * pixel-level features remain the documented stub swap point.
  *
  * Formats and their header contracts:
  *   - PNG — 8-byte signature, then the IHDR chunk (always first, per
  *     spec): width/height big-endian u32 at offsets 16/20, color type
  *     at 25 → channels (0 gray→1, 2 rgb→3, 3 palette→1, 4 gray+α→2,
  *     6 rgba→4).
  *   - GIF — "GIF87a"/"GIF89a", then the logical screen descriptor:
  *     width/height LITTLE-endian u16 at offsets 6/8; palette-RGB → 3.
  *   - JPEG — FF D8, then a marker walk (segments are length-prefixed,
  *     big-endian, length includes its own 2 bytes) to the first SOF
  *     frame header (C0-CF minus C4/C8/CC): precision u8, height u16,
  *     width u16, component count u8 (1 gray, 3 YCbCr, 4 CMYK). The
  *     walk skips APPn/COM/DQT/... and stops at SOS (entropy-coded data
  *     follows — a file with no SOF before SOS is malformed).
  *
  * Unrecognized/truncated payloads yield format 'unknown' with null
  * dims (nulls INSIDE the struct, not a null struct, so downstream
  * filters can count failures per format). Per-row, shuffle-free,
  * whole-stage-codegen — the blob is read once in the scan stage.
  */
case class ImageHeader(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"image_header requires binary, got $t")
    }

  override def dataType: DataType = ImageHeader.Schema
  override def prettyName: String = "image_header"

  override def nullSafeEval(input: Any): Any =
    ImageHeader.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ImageHeader.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageHeader {

  val Schema: StructType = new StructType()
    .add("format", StringType, nullable = false)
    .add("width", IntegerType)
    .add("height", IntegerType)
    .add("channels", IntegerType)

  private val Unknown = UTF8String.fromString("unknown")

  private def row(fmt: UTF8String, w: Int, h: Int, c: Int): InternalRow = {
    val r = new GenericInternalRow(4)
    r.update(0, fmt)
    if (w >= 0) r.setInt(1, w) else r.setNullAt(1)
    if (h >= 0) r.setInt(2, h) else r.setNullAt(2)
    if (c >= 0) r.setInt(3, c) else r.setNullAt(3)
    r
  }

  private def be16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  /** Static so generated code calls it directly (the [[SimHash48]]
    * discipline). Never returns null; never throws on garbage input.
    */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return row(Unknown, -1, -1, -1)
    val n = b.length
    // PNG: signature + IHDR (13-byte data) needs 8+4+4+13 = 29 bytes
    if (n >= 29 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a && (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16)
      val h = be32(b, 20)
      // spec caps dimensions at 2^31-1; oversized means corrupt
      if (w == 0 || h == 0 || w > Int.MaxValue || h > Int.MaxValue)
        return row(UTF8String.fromString("png"), -1, -1, -1)
      val channels = (b(25) & 0xff) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => -1
      }
      return row(UTF8String.fromString("png"), w.toInt, h.toInt, channels)
    }
    // GIF: header + logical screen descriptor = 13 bytes
    if (n >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      return row(UTF8String.fromString("gif"), le16(b, 6), le16(b, 8), 3)
    }
    // JPEG: SOI then marker walk to the first SOF
    if (n >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      val jpeg = UTF8String.fromString("jpeg")
      var p = 2
      while (p + 3 < n) {
        if ((b(p) & 0xff) != 0xff) return row(jpeg, -1, -1, -1) // lost sync
        // fill bytes: any number of 0xFF may pad before a marker
        var q = p + 1
        while (q < n && (b(q) & 0xff) == 0xff) q += 1
        if (q >= n) return row(jpeg, -1, -1, -1)
        val m = b(q) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          // SOF: len(2) precision(1) height(2) width(2) ncomp(1)
          if (q + 8 >= n) return row(jpeg, -1, -1, -1)
          return row(jpeg, be16(b, q + 6), be16(b, q + 4), b(q + 8) & 0xff)
        }
        if (m == 0xda || m == 0xd9) return row(jpeg, -1, -1, -1) // SOS/EOI before SOF
        if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) p = q + 1 // standalone, no length
        else {
          if (q + 2 >= n) return row(jpeg, -1, -1, -1)
          val segLen = be16(b, q + 1) // includes its own 2 bytes
          if (segLen < 2) return row(jpeg, -1, -1, -1)
          p = q + 1 + segLen
        }
      }
      return row(jpeg, -1, -1, -1)
    }
    row(Unknown, -1, -1, -1)
  }
}
