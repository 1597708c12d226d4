package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_md5(text, k)` — the md5 of every k-token window of a
  * single-space-tokenized string, one array element per window start,
  * in order. The relational form of suffix-style span anchoring
  * ([[graft.dedup.ExactSpans]]): window i covers tokens [i, i+k).
  *
  * Exists because the builtin composition
  * `transform(sequence(0, n-k), i -> md5(array_join(slice(toks, i+1, k), ' ')))`
  * is a higher-order function — evaluated INTERPRETED per element with
  * per-lambda-call overhead and O(k) boxed copies per window (measured
  * 21 s for the sf0.1 fixture's 330k windows). Here the insight is
  * byte-level: in a space-joined text every k-token window is one
  * CONTIGUOUS byte range, so a single offset scan plus one md5 per
  * window does the same work with zero copies — same hashes, same
  * order (`ExactSpansSpec` pins equality against the builtin form).
  *
  * Tokenization contract matches `split(text, ' ')`: empty text is one
  * empty token; consecutive spaces create empty tokens. Fewer than k
  * tokens → empty array, never null.
  */
case class ShingleMd5(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_md5 requires (string, int), got $l / $r")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_md5"

  override def nullSafeEval(t: Any, k: Any): Any =
    ShingleMd5.shingles(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"graft.plans.ShingleMd5.shingles($t, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleMd5 {

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Static so generated code calls it directly. */
  def shingles(text: UTF8String, k: Int): ArrayData = {
    require(k > 0, s"shingle_md5 window must be positive, got $k")
    val b = text.getBytes
    // token start offsets under the split(text, ' ') contract
    var nTok = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') nTok += 1; i += 1 }
    if (nTok < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < b.length) {
      if (b(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](nTok - k + 1)
    i = 0
    while (i <= nTok - k) {
      val begin = starts(i)
      val end = if (i + k == nTok) b.length else starts(i + k) - 1
      md.reset()
      md.update(b, begin, end - begin)
      val dig = md.digest()
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = HexDigits((dig(j) >> 4) & 0xF).toByte
        hex(2 * j + 1) = HexDigits(dig(j) & 0xF).toByte
        j += 1
      }
      out(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    new GenericArrayData(out)
  }
}
