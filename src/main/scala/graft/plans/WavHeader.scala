package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructType}

/** Real audio-container header decode — RIFF/WAVE `fmt ` chunk →
  * (sample_rate, channels, bits_per_sample, n_frames) — the audio twin
  * of [[ImageHeader]]: pure JVM byte inspection, no codec library. The
  * fields an audio pipeline filters on first (sample-rate routing,
  * mono/stereo, duration caps via n_frames/sample_rate) all live in the
  * container header; PCM decode proper stays behind the documented stub
  * ([[graft.multimodal.Multimodal]]).
  *
  * Header contract (all little-endian, per the RIFF spec):
  * bytes 0-3 "RIFF", 8-11 "WAVE", then a chunk walk — each chunk is
  * (4-byte id, 4-byte size, payload, odd sizes padded) — to `fmt `
  * (audio format u16 @+0, channels u16 @+2, sample rate u32 @+4,
  * bits/sample u16 @+14) and `data` (n_frames = size / block_align).
  * The chunk walk matters: real encoders emit `LIST`/`fact`/cue chunks
  * before `data`, so fixed offsets break exactly where the parser is
  * needed.
  *
  * Unrecognized/truncated payloads yield nulls inside the struct (never
  * a null struct) so failure counts group cleanly. Per-row, shuffle-free,
  * whole-stage codegen.
  */
case class WavHeader(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"wav_header requires binary, got $t")
    }

  override def dataType: DataType = WavHeader.Schema
  override def prettyName: String = "wav_header"

  override def nullSafeEval(input: Any): Any =
    WavHeader.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WavHeader.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavHeader {

  val Schema: StructType = new StructType()
    .add("sample_rate", IntegerType)
    .add("channels", IntegerType)
    .add("bits_per_sample", IntegerType)
    .add("n_frames", LongType)

  private def row(rate: Int, ch: Int, bits: Int, frames: Long): InternalRow = {
    val r = new GenericInternalRow(4)
    if (rate >= 0) r.setInt(0, rate) else r.setNullAt(0)
    if (ch >= 0) r.setInt(1, ch) else r.setNullAt(1)
    if (bits >= 0) r.setInt(2, bits) else r.setNullAt(2)
    if (frames >= 0) r.setLong(3, frames) else r.setNullAt(3)
    r
  }

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], p: Int, t: String): Boolean =
    b(p) == t.charAt(0) && b(p + 1) == t.charAt(1) &&
      b(p + 2) == t.charAt(2) && b(p + 3) == t.charAt(3)

  /** Static so generated code calls it directly. Never null, never throws. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return row(-1, -1, -1, -1L)
    var rate = -1; var ch = -1; var bits = -1; var blockAlign = -1
    var frames = -1L
    var p = 12
    val n = b.length
    while (p >= 0 && p + 8 <= n) {
      val size = le32(b, p + 4)
      val payload = p + 8
      if (tag(b, p, "fmt ") && size >= 16 && payload + 16 <= n) {
        ch = le16(b, payload + 2)
        val r = le32(b, payload + 4)
        rate = if (r <= Int.MaxValue) r.toInt else -1
        blockAlign = le16(b, payload + 12)
        bits = le16(b, payload + 14)
      } else if (tag(b, p, "data")) {
        // frames = declared data bytes / block align. A header-only blob
        // (declared size past the buffer) still yields the header's
        // frame count — the walk just ends after this chunk.
        frames = size
      }
      // odd chunk sizes pad one byte; advance in Long so a forged 4 GiB
      // size can't wrap p negative and loop
      val next = payload.toLong + size + (size & 1L)
      p = if (next > n || next <= p) -1 else next.toInt
    }
    val nFrames =
      if (frames >= 0 && blockAlign > 0) frames / blockAlign else -1L
    row(rate, ch, bits, nFrames)
  }
}
