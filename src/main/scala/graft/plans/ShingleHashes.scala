package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct MinHash base hashes of a string's word n-gram shingles, in
  * one pass: tokenize → n-gram shingle → md5 → 48-bit hex fold → mod p →
  * distinct. Value-identical to the composable chain
  * `array_distinct(baseHashes(shingles(text)))` (tested), but without
  * its per-row cost: that chain allocates a char-split array, three
  * slice arrays, a zip_with cascade, per-shingle UTF8String shingles,
  * and runs `conv(substring(md5, …))` through three expression nodes —
  * here the row is scanned once and each shingle costs one digest.
  *
  * Tokenization replicates Spark's `split(trim(c), "\\s+")` exactly:
  * trim strips ASCII spaces only (Spark/DuckDB `trim` semantics — NOT
  * `String.trim`, which also strips control chars), then Java regex
  * split, then empty-token filter. The hash contract (md5 of the
  * shingle's UTF-8 bytes, first 12 hex chars as an integer, mod
  * [[HashConstants.P]]) is shared with the DuckDB oracle, which is
  * unchanged by this expression.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires (string, n>=1), got ${child.dataType}, n=$n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  val P: Long = HashConstants.P

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val str = s.toString
    // Spark's trim(): strip ASCII 0x20 only
    var b = 0
    var e = str.length
    while (b < e && str.charAt(b) == ' ') b += 1
    while (e > b && str.charAt(e - 1) == ' ') e -= 1
    val toks0 = Whitespace.split(str.substring(b, e), -1)
    val toks = new java.util.ArrayList[String](toks0.length)
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) toks.add(toks0(i)); i += 1 }
    val m = toks.size
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val seenShingle = new java.util.HashSet[String]()
    val seenHash = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder
    i = 0
    while (i <= m - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(i + j))
        j += 1
      }
      val shingle = sb.toString
      if (seenShingle.add(shingle)) {
        val d = md.digest(shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 12 hex chars == first 6 bytes, big-endian
        var h = 0L
        var k = 0
        while (k < 6) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        seenHash.add(h % P)
      }
      i += 1
    }
    val out = new Array[Long](seenHash.size)
    val it = seenHash.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
