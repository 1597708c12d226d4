package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §6.2.2 percent-encoding normalization — the equivalence
  * the string-level canonicalizer (X109) can't see: `%7Ealice`,
  * `%7ealice` and `~alice` are THE SAME URI, and a frontier that
  * doesn't normalize them fetches the page three times. Two rules,
  * both from the RFC:
  *
  *  - §6.2.2.1 case: hex digits in percent-escapes normalize to
  *    UPPERCASE (`%3a` → `%3A`) — the escape is case-insensitive, its
  *    canonical spelling is not;
  *  - §6.2.2.2 decode unreserved: escapes of the unreserved set
  *    (ALPHA / DIGIT / `-` `.` `_` `~`) decode (`%41` → `A`,
  *    `%7E` → `~`); every OTHER escape (reserved or non-ASCII octets)
  *    stays encoded — decoding `%2F` would change which slash
  *    delimits the path.
  *
  * Malformed escapes (`%G1`, a trailing `%`) pass through untouched —
  * crawl URLs carry them constantly and a thrown parse would poison
  * the whole partition. Per-row, shuffle-free, codegen via a static
  * call; composes in front of [[graft.text.Canonical.canonicalize]].
  */
case class PctNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pct_normalize requires string, got $t")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "pct_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      PctNormalize.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.PctNormalize.normalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PctNormalize {

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  private val HexUpper = "0123456789ABCDEF"

  /** Static so generated code calls it directly. Never throws. */
  def normalize(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n) {
        val h = hexVal(s.charAt(i + 1))
        val l = hexVal(s.charAt(i + 2))
        if (h >= 0 && l >= 0) {
          val v = (h << 4) | l
          if (isUnreserved(v)) out.append(v.toChar)
          else out.append('%').append(HexUpper.charAt(h)).append(HexUpper.charAt(l))
          i += 3
        } else { out.append(c); i += 1 } // malformed: not two hex digits
      } else { out.append(c); i += 1 } // includes a trailing % / %X
    }
    out.toString
  }
}
