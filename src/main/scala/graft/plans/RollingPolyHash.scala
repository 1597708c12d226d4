package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp polynomial fingerprint of a whole string —
  * `h ← (h·31 + codepoint) mod 1e9+7` folded over the text — as ONE
  * codegen'd expression. Semantics are exactly
  * [[graft.text.Analysis.rollingHashHof]]'s builtin-only chain
  * (`aggregate(split(text, ''), …)`), kept as the porting-reference twin
  * and equivalence fixture; this form exists because the HOF chain
  * materializes a per-CHARACTER array of 1-char strings per row and
  * evaluates a lambda per element outside whole-stage codegen — per-row
  * garbage proportional to text length, the same cost shape
  * [[DotProductLong]] replaced for dot products. Here the fold is a
  * primitive loop over the string's code points inside the scan stage:
  * no array, no per-char allocation, no codegen break.
  *
  * The explicit 1e9+7 modulus keeps every intermediate ≤ ~3.1e16 — exact
  * in long arithmetic on both engines (DuckDB's checked BIGINT would trap
  * a natural 2^64 wraparound).
  */
case class RollingPolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"rolling_poly_hash requires string, got $t")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_poly_hash"

  override def nullSafeEval(input: Any): Any =
    RollingPolyHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RollingPolyHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingPolyHash {
  val Mod = 1000000007L

  /** Static so generated code calls it directly. Iterates CODE POINTS
    * (what `ascii(ch)` yields per split character on both engines).
    */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}
