package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructType}

/** `wav_afp(content, cells)` — the energy-envelope perceptual AUDIO
  * fingerprint: the audio member of the near-dup family (text MinHash,
  * image dHash, now sound). The decoded 16-bit PCM stream is
  * box-reduced to `cells + 1` equal index ranges, each summarized by
  * its exact integer mean |v| (the energy envelope), and bit j is set
  * when envelope[j] > envelope[j+1] — loudness GRADIENTS survive
  * re-encoding and small edits the way brightness gradients do for
  * images.
  *
  * Output struct: (n_samples, afp) — the near-dup join buckets on the
  * sample count (the duration class, the audio analogue of the image
  * dimension class). NULL when the blob is not decodable 16-bit PCM or
  * has fewer samples than cells + 1 (the floor index map
  * `i·(cells+1) DIV k` is onto exactly when k ≥ cells+1, so every cell
  * divides totally — the PngDhash argument).
  *
  * Exact integer end to end, so a SQL engine reproduces every bit from
  * planted sample formulas. One pass via [[WavPcm.walk]]'s sample sink
  * — three consumers (stats, segmentation, fingerprint) now ride one
  * decode core.
  */
case class WavFingerprint(child: Expression, cells: Int) extends UnaryExpression {
  require(cells >= 1 && cells <= 64, s"cells out of range: $cells")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"wav_afp requires binary, got $t")
    }

  override def dataType: DataType = WavFingerprint.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "wav_afp"

  override def nullSafeEval(input: Any): Any =
    WavFingerprint.compute(input.asInstanceOf[Array[Byte]], cells)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("afp")
      s"""InternalRow $r = graft.plans.WavFingerprint.compute($c, $cells);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavFingerprint {

  val Schema: StructType = new StructType()
    .add("n_samples", LongType)
    .add("afp", LongType)

  private final class EnvelopeSink(cells: Int, k: Int) extends WavPcm.SampleSink {
    val nCells = cells + 1
    val sum = new Array[Long](nCells)
    val cnt = new Array[Long](nCells)
    def sample(i: Int, v: Int): Unit = {
      val a = if (v < 0) -v.toLong else v.toLong
      val c = (i.toLong * nCells / k).toInt
      sum(c) += a
      cnt(c) += 1
    }
  }

  /** Static for codegen. The cell map needs the TRUE sample count up
    * front, and a truncated blob's count is only known after a walk —
    * so walk twice through the shared routine: a counting pass, then
    * the envelope pass (both linear byte scans; the declared chunk
    * size alone would drift on truncated blobs).
    */
  def compute(b: Array[Byte], cells: Int): InternalRow =
    envelopeOver(WavPcm.walk, b, cells)

  /** The envelope fold over ANY decoder speaking the shared sample
    * sink — [[WavPcm.walk]] here, [[FlacPcm.walk]] in
    * [[FlacFingerprint]]: one fingerprint definition across codecs, so
    * a WAV master and its FLAC re-encode hash identically.
    */
  private[plans] def envelopeOver(walkFn: (Array[Byte], WavPcm.SampleSink) => Int,
                                  b: Array[Byte], cells: Int): InternalRow = {
    var n = 0
    val counter = new WavPcm.SampleSink {
      def sample(i: Int, v: Int): Unit = { n = i + 1 }
    }
    if (walkFn(b, counter) < 0) return null
    if (n < cells + 1) return null
    val sink = new EnvelopeSink(cells, n)
    walkFn(b, sink)
    var fp = 0L
    var j = 0
    while (j < cells) {
      val ev = sink.sum(j) / sink.cnt(j)
      val en = sink.sum(j + 1) / sink.cnt(j + 1)
      if (ev > en) fp |= 1L << j
      j += 1
    }
    val out = new GenericInternalRow(2)
    out.setLong(0, n.toLong)
    out.setLong(1, fp)
    out
  }
}
