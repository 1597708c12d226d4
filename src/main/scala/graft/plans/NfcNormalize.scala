package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonicalization a multilingual
  * corpus needs BEFORE hashing, dedup, or tokenization: the same
  * visible text arrives from crawls in composed (é) and decomposed
  * (e + U+0301) forms, and every hash-keyed operator in this engine
  * (exact dedup, MinHash shingles, token counts) would treat them as
  * different documents. Wraps the JVM's `java.text.Normalizer` (ICU
  * lineage); the DuckDB oracle runs its own `nfc_normalize`
  * (utf8proc lineage) over the same planted sequences — two fully
  * independent Unicode implementations must agree for the gate to
  * pass, which pins composition (e+◌́ → é), Hangul LV jamo
  * composition, singleton mapping (U+212B Å → U+00C5), and the
  * non-composition of marks with no precomposed form.
  *
  * Per-row, shuffle-free, codegen'd; NFC is idempotent so re-running
  * the pass is safe (spec-pinned).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize requires string, got $t")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static so generated code calls it directly. Fast path: NFC quick
    * check via isNormalized avoids materializing a new string for the
    * (overwhelmingly common) already-composed input.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
