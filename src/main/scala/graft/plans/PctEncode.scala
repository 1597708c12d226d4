package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 percent-ENCODING — the inverse of [[PctNormalize]] and the
  * step a crawler runs when it COMPOSES URLs from extracted strings
  * (search forms, api templates, redirects it must re-issue): every
  * octet outside the component's allowed set escapes as `%XX`
  * uppercase, non-ASCII first encoded as UTF-8 octets (§2.5 — `é` →
  * `%C3%A9`). Two component grammars:
  *
  *  - `pct_encode_path`: a path SEGMENT — unreserved + sub-delims +
  *    `:` `@` stay literal (§3.3 pchar minus pct-encoded);
  *  - `pct_encode_query`: a query VALUE — unreserved only stays
  *    literal (the conservative form every URL builder is safe with;
  *    `&`, `=`, `+` all escape so the value can never split the
  *    query).
  *
  * Output is already in §6.2.2 normal form (uppercase hex, no
  * unreserved escapes) — `pct_normalize ∘ pct_encode = pct_encode`,
  * spec-pinned. Per-row, shuffle-free, codegen.
  */
case class PctEncode(child: Expression, queryMode: Boolean) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pct_encode requires string, got $t")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = if (queryMode) "pct_encode_query" else "pct_encode_path"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      PctEncode.encode(input.asInstanceOf[UTF8String].toString, queryMode))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.PctEncode.encode($c.toString(), $queryMode))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PctEncode {

  private val HexUpper = "0123456789ABCDEF"

  private def isUnreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' || b == '~'

  // sub-delims + ':' '@' (RFC 3986 §3.3 pchar, minus pct-encoded)
  private def isPathExtra(b: Int): Boolean = b match {
    case '!' | '$' | '&' | '\'' | '(' | ')' | '*' | '+' | ',' | ';' | '=' |
         ':' | '@' => true
    case _ => false
  }

  /** Static so generated code calls it directly. Never throws. */
  def encode(s: String, queryMode: Boolean): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (isUnreserved(b) || (!queryMode && isPathExtra(b))) out.append(b.toChar)
      else out.append('%').append(HexUpper.charAt(b >> 4)).append(HexUpper.charAt(b & 0xf))
      i += 1
    }
    out.toString
  }
}
