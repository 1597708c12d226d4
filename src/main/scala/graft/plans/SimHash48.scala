package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Production-width SimHash: a 48-bit signature from per-token md5 bit
  * votes, as ONE codegen'd expression over `array<string>` tokens.
  *
  * The composable 16-bit twin ([[graft.dedup.Dedup.SimHash]], kept as the
  * oracle-expressible demonstration) costs 16 `filter(substring(md5))`
  * probes per row and — decisively — only supports 4-bit LSH bands:
  * 16 buckets per band means candidate pairs grow O(n²/16), the exact
  * quadratic ceiling the round-2 scale probe caught in the sign-LSH
  * family. 48 bits keeps every value positive in a BIGINT on both
  * engines (no 2^63 sign traps) and yields 12-bit bands: 4096 buckets
  * per band, so the banded self-join stays sub-quadratic at any corpus
  * size while the Hamming≤3 pigeonhole guarantee (4 bands, 3 flipped
  * bits leave ≥1 band intact) is preserved.
  *
  * Bit contract (the cross-engine formula): token digest = md5 of the
  * token's UTF-8 bytes; h = big-endian value of the digest's first 6
  * bytes (first 12 hex chars); bit i of the signature (i=0 LSB) is set
  * iff a strict majority of token digests have bit i of h set. The
  * DuckDB twin ([[SimHash48.sql]]) reads the same bits out of the md5
  * hex string: bit i lives in hex char `12 - i/4` (1-based) at nibble
  * shift `i % 4`.
  */
case class SimHash48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"simhash48 requires array<string>, got $t")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash48"

  override def nullSafeEval(input: Any): Any =
    SimHash48.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash48.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash48 {
  val Bits = 48
  val BandBits = 12
  val NumBands: Int = Bits / BandBits // 4
  val BandMask: Long = (1L << BandBits) - 1 // 4095

  /** Static so generated code calls it directly; one MessageDigest per
    * invocation (md5 instances are cheap; a thread-local would leak across
    * codegen classloaders).
    */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](Bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var t = 0
    var voters = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val d = md.digest(tokens.getUTF8String(t).getBytes)
        var h = 0L
        var b = 0
        while (b < 6) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        var i = 0
        while (i < Bits) { votes(i) += ((h >>> i) & 1L).toInt; i += 1 }
        voters += 1
        md.reset()
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < Bits) { if (2 * votes(i) > voters) sig |= (1L << i); i += 1 }
    sig
  }

  /** DuckDB twin over a token-list SQL expression: identical bit reads
    * from the md5 hex string, identical strict-majority votes.
    */
  def sql(tokensSql: String): String = {
    // hex char -> nibble value via the ascii fold (same idiom as
    // MinHashLSH.baseHashesSql)
    def nib(cPos: Int) =
      s"(ascii(substring(m, $cPos, 1)) - 48 - CASE WHEN ascii(substring(m, $cPos, 1)) >= 97 THEN 39 ELSE 0 END)"
    val bitTerms = (0 until Bits).map { i =>
      val cPos = 12 - i / 4
      val shift = i % 4
      s"CASE WHEN 2 * len(list_filter(tt, m -> ((${nib(cPos)} >> $shift) & 1) = 1)) > len(tt) THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    s"(SELECT CAST($bitTerms AS BIGINT) FROM (SELECT list_transform($tokensSql, t -> md5(t)) AS tt))"
  }
}
