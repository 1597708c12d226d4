package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `splice_token_spans(text, spans)` — remove the byte ranges of the
  * given TOKEN-index spans from `text`, where tokens are maximal runs
  * of non-whitespace (the Java-regex `\s` class: space, tab, LF, VT,
  * FF, CR — matching `regexp_replace(text, "\\s+", " ")`, the
  * normalization [[graft.dedup.ExactSpans.scrubWs]] hashes over, so
  * token indices here align 1:1 with that normalized form's tokens).
  *
  * A span (s, e) — inclusive token indices, spans sorted ascending and
  * non-overlapping — removes exactly the bytes
  * `[start-of-token-s, end-of-token-e)`: the tokens themselves plus the
  * whitespace strictly BETWEEN them. Whitespace before the span's first
  * token and after its last survives untouched, so with no spans the
  * output is the input byte-for-byte (the identity round-trip the
  * whitespace-exact scrub's contract rests on). All six whitespace
  * bytes are single-byte in UTF-8, so the scan is byte-exact for any
  * multi-byte content.
  *
  * Out-of-range indices are clamped defensively (a span starting past
  * the last token is ignored) — by construction upstream spans come
  * from window positions over the same tokenization and are in range.
  */
case class SpliceTokenSpans(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(st: StructType, _))
        if st.fields.length == 2 &&
          st.fields.forall(_.dataType == IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"splice_token_spans requires (string, array<struct<int,int>>), got $l / $r")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "splice_token_spans"

  override def nullSafeEval(t: Any, sp: Any): Any =
    SpliceTokenSpans.splice(t.asInstanceOf[UTF8String], sp.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, sp) => s"graft.plans.SpliceTokenSpans.splice($t, $sp)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpliceTokenSpans {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Static so generated code calls it directly. */
  def splice(text: UTF8String, spans: ArrayData): UTF8String = {
    val n = spans.numElements()
    if (n == 0) return text
    val b = text.getBytes
    // token byte ranges: starts(i) inclusive, ends(i) exclusive
    var nTok = 0
    var i = 0
    var inTok = false
    while (i < b.length) {
      val ws = isWs(b(i))
      if (!ws && !inTok) nTok += 1
      inTok = !ws
      i += 1
    }
    if (nTok == 0) return text
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    i = 0
    inTok = false
    while (i < b.length) {
      val ws = isWs(b(i))
      if (!ws && !inTok) { starts(t) = i; t += 1 }
      if (ws && inTok) ends(t - 1) = i
      inTok = !ws
      i += 1
    }
    if (inTok) ends(nTok - 1) = b.length
    val out = new java.io.ByteArrayOutputStream(b.length)
    var prev = 0
    var s = 0
    while (s < n) {
      val row = spans.getStruct(s, 2)
      val from = row.getInt(0)
      val to = math.min(row.getInt(1), nTok - 1)
      if (from < nTok && to >= from) {
        val cutFrom = starts(from)
        val cutTo = ends(to)
        if (cutFrom > prev) out.write(b, prev, cutFrom - prev)
        prev = math.max(prev, cutTo)
      }
      s += 1
    }
    if (prev < b.length) out.write(b, prev, b.length - prev)
    UTF8String.fromBytes(out.toByteArray)
  }
}
