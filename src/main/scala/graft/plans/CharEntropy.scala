package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/** `char_entropy(text)` — the per-document character-distribution
  * signal a garbage detector cuts on BEFORE tokenizing: repetitive
  * spam ("aaaa…", padded boilerplate) sits near zero entropy, random
  * blobs that leaked into a text column (base64 payloads, hex dumps,
  * encrypted content) sit near the top, natural language in between.
  * The quality heuristics of X9/X35 assume words; this signal needs
  * none, which is exactly why it catches the inputs that break
  * word-level filters.
  *
  * Exactness discipline: Shannon entropy needs logs, so the engine
  * pair agrees on the 1/16-bit fixed-point form instead (the
  * [[graft.text.QualityTrain]] `log2fp` quantizer — whole-bit msb
  * would collapse hex blobs and English onto the same value):
  * `entropy_q = Σ_c cnt_c · (log2fp(n) − log2fp(cnt_c))` over
  * code-point counts, log2fp(x) = ⌊log₂x⌋ in sixteenths with the
  * within-octave remainder linearly interpolated — every term an
  * exact integer, reproduced verbatim in SQL. entropy_q/16/n is
  * bits-per-char: ~1 for two-symbol repetition, ~4.1 for English,
  * 6 for a base64 blob. Output struct: (n_chars, distinct_chars,
  * entropy_q); empty text answers zeros (the gate's no-evidence
  * filter drops it). Per-row, shuffle-free, codegen via a static
  * call; memory is one histogram of the document's distinct code
  * points.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_entropy requires string, got $t")
  }
  override def dataType: DataType = CharEntropy.Schema
  override def prettyName: String = "char_entropy"
  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharEntropy.compute($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {

  val Schema: StructType = new StructType()
    .add("n_chars", LongType)
    .add("distinct_chars", LongType)
    .add("entropy_q", LongType)

  /** ⌊log₂x⌋ in sixteenths, x ≥ 1 — the JVM twin of
    * [[graft.text.QualityTrain.log2fpSparkSql]]'s arithmetic.
    */
  def log2fp(x: Long): Long = {
    val msb = 64 - java.lang.Long.numberOfLeadingZeros(x)
    (msb - 1).toLong * 16 + ((16 * x) >> (msb - 1)) - 16
  }

  /** Static so generated code calls it directly. Never null. */
  def compute(s: String): InternalRow = {
    val hist = new java.util.HashMap[Integer, Array[Long]]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = hist.get(cp)
      if (slot == null) hist.put(cp, Array(1L)) else slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    var h = 0L
    if (n > 0) {
      val ln = log2fp(n)
      val it = hist.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        h += c * (ln - log2fp(c))
      }
    }
    val out = new GenericInternalRow(3)
    out.setLong(0, n)
    out.setLong(1, hist.size().toLong)
    out.setLong(2, h)
    out
  }
}
