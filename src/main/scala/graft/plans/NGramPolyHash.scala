package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct polynomial hashes of every character n-gram of a string, in
  * one pass: `hᵢ = (Σⱼ cp(cᵢ₊ⱼ)·B^(n-1-j)) mod P` over Unicode codepoints.
  *
  * This replaces the composable pipeline `split('') → slice×n → zip_with×
  * (n-1) → md5 → conv` that the char-gram LSH would otherwise need — that
  * chain allocates n arrays plus one md5 digest per window and was the
  * dominant cost of the near-dup query. Here the row is scanned once, each
  * window costs n multiply-adds, and the distinct set builds in a hash
  * set — no per-window allocation.
  *
  * The formula (not the implementation) is the cross-engine contract: the
  * DuckDB oracle computes the identical Σ·B^j mod P per window over
  * `ascii(substring(...))` codepoints, so the gate stays bit-exact.
  * Codepoints (not UTF-16 units) are iterated for exactly that parity.
  */
case class NGramPolyHash(child: Expression, n: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"ngram_poly_hash requires (string, n>=1), got ${child.dataType}, n=$n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_poly_hash"

  override def nullSafeEval(input: Any): Any =
    NGramPolyHash.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NGramPolyHash.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGramPolyHash {
  val P: Long = HashConstants.P
  val B: Long = HashConstants.B

  /** Distinct window hashes as a long[]; static so generated code can call
    * it (the loop itself doesn't benefit from inlining into codegen).
    */
  def hashesOf(s: UTF8String, n: Int): Array[Long] = {
    val cps = s.toString.codePoints().toArray
    if (cps.length < n) return Array.emptyLongArray
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= cps.length - n) {
      var h = 0L
      var j = 0
      while (j < n) { h = (h * B + cps(i + j)) % P; j += 1 }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  def compute(s: UTF8String, n: Int): ArrayData = new GenericArrayData(hashesOf(s, n))

  /** DuckDB twin of the same formula (order of the distinct set differs —
    * callers must treat the result as a set, which the LSH machinery does).
    */
  def sql(c: String, n: Int): String = {
    val terms = (0 until n)
    // Horner evaluation with mod at each step, exactly as hashesOf does;
    // BIGINT seed so DuckDB doesn't run the chain in (overflowing) INT32
    val folded = terms.foldLeft("CAST(0 AS BIGINT)") { (acc, j) =>
      s"(($acc) * $B + ascii(substring($c, i + $j, 1))) % $P"
    }
    s"list_distinct(list_transform(range(1, greatest(length($c) - ${n - 2}, 1)), i -> $folded))"
  }
}
