package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructType}

/** Real PCM sample decode — the audio half of the multimodal decode
  * surface that used to be the documented stub: RIFF/WAVE chunk walk
  * (same contract as [[WavHeader]]) to the `fmt ` and `data` chunks,
  * then the raw little-endian SIGNED 16-bit frames of the `data`
  * payload, folded into the amplitude statistics an audio quality
  * filter cuts on first:
  *
  *   (n_samples, sum_abs, peak, clip_count) — all exact integers
  *   (mean-abs is `sum_abs DIV n_samples` downstream; clip = sample at
  *   full scale ±, i.e. 32767 or -32768).
  *
  * Needs NO codec library: 16-bit PCM (`fmt` audio format 1) IS the raw
  * frame stream. Non-PCM formats and other bit depths yield nulls
  * inside the struct (never a null struct) so failure counts group
  * cleanly; a `data` chunk declaring more bytes than the buffer holds
  * is decoded to the bytes actually present (truncated-blob shape).
  * Per-row, shuffle-free, whole-stage codegen — one pass over the
  * payload, no sample array materialized.
  */
case class WavPcm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"wav_pcm requires binary, got $t")
    }

  override def dataType: DataType = WavPcm.Schema
  override def prettyName: String = "wav_pcm"

  override def nullSafeEval(input: Any): Any =
    WavPcm.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WavPcm.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavPcm {

  val Schema: StructType = new StructType()
    .add("n_samples", LongType)
    .add("sum_abs", LongType)
    .add("peak", LongType)
    .add("clip_count", LongType)

  private def nulls: InternalRow = {
    val r = new GenericInternalRow(4)
    r.setNullAt(0); r.setNullAt(1); r.setNullAt(2); r.setNullAt(3)
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

  /** Per-sample visitor for [[walk]] — decoded signed 16-bit value at
    * sample index i. Lets stats and segmentation consumers share one
    * chunk walk + sample loop without ever materializing a sample
    * array (the PngPixels.walk discipline).
    */
  trait SampleSink {
    def sample(i: Int, v: Int): Unit
  }

  /** Shared decode: chunk walk to fmt/data, then every 16-bit PCM
    * sample into `sink`. Returns the sample count, or -1 when the blob
    * is not decodable linear 16-bit PCM.
    */
  def walk(b: Array[Byte], sink: SampleSink): Int = {
    if (b == null || b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return -1
    var fmtCode = -1; var bits = -1
    var dataAt = -1; var dataLen = 0L
    var p = 12
    val n = b.length
    while (p >= 0 && p + 8 <= n) {
      val size = le32(b, p + 4)
      val payload = p + 8
      if (tag(b, p, "fmt ") && size >= 16 && payload + 16 <= n) {
        fmtCode = le16(b, payload)
        bits = le16(b, payload + 14)
      } else if (tag(b, p, "data") && dataAt < 0) {
        dataAt = payload
        dataLen = size
      }
      // odd chunk sizes pad one byte; advance in Long so a forged 4 GiB
      // size can't wrap p negative and loop (the WavHeader discipline)
      val next = payload.toLong + size + (size & 1L)
      p = if (next > n || next <= p) -1 else next.toInt
    }
    // decodable = linear PCM at 16 bits with a located data chunk
    if (fmtCode != 1 || bits != 16 || dataAt < 0) return -1
    // bytes actually present: a header-only or truncated blob declares
    // more than the buffer carries — decode what's there
    val avail = math.min(dataLen, (n - dataAt).toLong)
    val k = (avail / 2L).toInt
    var i = 0
    while (i < k) {
      sink.sample(i, le16(b, dataAt + 2 * i).toShort.toInt)
      i += 1
    }
    k
  }

  private final class StatsSink extends SampleSink {
    var sumAbs = 0L; var peak = 0L; var clip = 0L
    def sample(i: Int, v: Int): Unit = {
      val a = if (v < 0) -v.toLong else v.toLong
      sumAbs += a
      if (a > peak) peak = a
      if (v == 32767 || v == -32768) clip += 1
    }
  }

  /** Static so generated code calls it directly. Never null, never throws. */
  def parse(b: Array[Byte]): InternalRow = {
    val s = new StatsSink
    val k = walk(b, s)
    if (k < 0) return nulls
    val r = new GenericInternalRow(4)
    r.setLong(0, k.toLong); r.setLong(1, s.sumAbs); r.setLong(2, s.peak)
    r.setLong(3, s.clip)
    r
  }

}
