package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StructType}

/** `wav_segments(content, threshold)` — energy-based voice-activity
  * segmentation over decoded 16-bit PCM: the maximal runs of ACTIVE
  * samples (|v| ≥ threshold), each as (start, end, n_samples, peak)
  * with end exclusive — the first pass of every speech-data pipeline
  * (silence trimming, utterance splitting, speech-density filtering
  * all consume exactly this table).
  *
  * Runs inside the decoder in ONE pass via [[WavPcm.walk]]'s sample
  * sink — per-blob output is the handful of segments, never a
  * per-sample row, which is what keeps a 100 TB audio sweep map-only
  * (the explode-samples-then-window alternative shuffles every sample
  * of every file). Non-PCM/undecodable blobs yield an EMPTY array —
  * distinguishable from decodable-but-silent via [[WavPcm]].
  */
case class WavSegments(child: Expression, threshold: Int) extends UnaryExpression {
  require(threshold >= 1 && threshold <= 32768, s"threshold out of range: $threshold")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"wav_segments requires binary, got $t")
    }

  override def dataType: DataType =
    ArrayType(WavSegments.SegmentSchema, containsNull = false)
  override def prettyName: String = "wav_segments"

  override def nullSafeEval(input: Any): Any =
    WavSegments.compute(input.asInstanceOf[Array[Byte]], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WavSegments.compute($c, $threshold)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavSegments {

  val SegmentSchema: StructType = new StructType()
    .add("start", LongType)
    .add("end", LongType)
    .add("n_samples", LongType)
    .add("peak", LongType)

  private final class RunSink(threshold: Int) extends WavPcm.SampleSink {
    val out = new java.util.ArrayList[AnyRef]()
    var runStart = -1
    var runPeak = 0L
    var last = -1
    def sample(i: Int, v: Int): Unit = {
      val a = if (v < 0) -v.toLong else v.toLong
      if (a >= threshold) {
        if (runStart < 0) { runStart = i; runPeak = 0L }
        if (a > runPeak) runPeak = a
      } else close(i)
      last = i
    }
    def close(endEx: Int): Unit = {
      if (runStart >= 0) {
        val r = new GenericInternalRow(4)
        r.setLong(0, runStart.toLong)
        r.setLong(1, endEx.toLong)
        r.setLong(2, (endEx - runStart).toLong)
        r.setLong(3, runPeak)
        out.add(r)
        runStart = -1
      }
    }
  }

  /** Static so generated code calls it directly. Never null. */
  def compute(b: Array[Byte], threshold: Int): GenericArrayData = {
    val sink = new RunSink(threshold)
    val k = WavPcm.walk(b, sink)
    if (k < 0) return new GenericArrayData(Array.empty[AnyRef])
    sink.close(k) // trailing active run ends at the stream end
    new GenericArrayData(sink.out.toArray)
  }
}
