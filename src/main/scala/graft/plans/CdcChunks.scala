package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: split a string where the rolling hash of the
  * trailing `w`-codepoint window satisfies `h % divisor == 0` — the CDC /
  * winnowing boundary rule that sliding-window dedup, partial-overlap
  * (quote) detection, and RAG chunkers are built on. Boundaries depend
  * only on LOCAL content, so a shared span chunks identically in any two
  * documents regardless of what precedes it — the property that makes
  * cross-document chunk-hash joins find duplicated spans.
  *
  * One pass per row: the window hash updates incrementally
  * (`h ← (h − cp_out·B^(w−1))·B + cp_in mod p`, kept positive), each
  * chunk is emitted as a substring — no per-window allocation, no n×w
  * rescan. The DuckDB twin ([[CdcChunks.sql]]) recomputes each window
  * hash by direct Horner fold (oracle-side cost is irrelevant) over the
  * same codepoints, mod the same p, and slices with codepoint-based
  * `substring`, so both engines emit identical chunk lists.
  */
case class CdcChunks(child: Expression, w: Int, divisor: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && w >= 2 && divisor >= 2)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires (string, w>=2, divisor>=2), got ${child.dataType}, w=$w, divisor=$divisor")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], w, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CdcChunks.compute($c, $w, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {
  val P: Long = HashConstants.P
  val B: Long = HashConstants.B

  /** Default shape: 16-codepoint window, divisor 64 → expected chunk
    * length ≈ 64 codepoints.
    */
  val DefaultW = 16
  val DefaultDivisor = 64

  def compute(s: UTF8String, w: Int, divisor: Int): GenericArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // B^w mod p — weight of the codepoint leaving the window after shift
    var bw = 1L
    var k = 0
    while (k < w) { bw = bw * B % P; k += 1 }
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var i = 0
    var chunkStartChar = 0 // UTF-16 offset where the current chunk starts
    var charPos = 0        // UTF-16 offset AFTER codepoint i
    while (i < n) {
      h = (h * B + cps(i)) % P
      if (i >= w) // drop the codepoint that left the window (index i-w)
        h = ((h - cps(i - w) * bw % P) % P + P) % P
      charPos += Character.charCount(cps(i))
      if (i >= w - 1 && h % divisor == 0 && charPos < str.length) {
        chunks += UTF8String.fromString(str.substring(chunkStartChar, charPos))
        chunkStartChar = charPos
      }
      i += 1
    }
    chunks += UTF8String.fromString(str.substring(chunkStartChar))
    new GenericArrayData(chunks.toArray)
  }

  /** DuckDB twin, two fragments (a correlated subquery into FROM is not
    * bindable in DuckDB, so callers bind `b` via a CTE column):
    * [[boundariesSql]] = boundary positions by direct per-window Horner
    * fold; [[slicesSql]] = codepoint-based substring slices between
    * consecutive boundaries.
    */
  def boundariesSql(c: String, w: Int, divisor: Int): String = {
    // window hash of the w-gram ENDING at codepoint position i (1-based):
    // Horner over substring(c, i-w+1 .. i)
    val fold = (0 until w).foldLeft("CAST(0 AS BIGINT)") { (acc, j) =>
      s"(($acc) * $B + ascii(substring($c, i - ${w - 1} + $j, 1))) % $P"
    }
    s"""list_concat(
       |  list_concat([CAST(0 AS BIGINT)],
       |    list_filter(list_transform(range($w, length($c) + 1),
       |      i -> CASE WHEN ($fold) % $divisor = 0 AND i < length($c) THEN i END),
       |      x -> x IS NOT NULL)),
       |  [CAST(length($c) AS BIGINT)])""".stripMargin.replace("\n", " ")
  }

  /** Slices of `c` between consecutive entries of a bound boundary-list
    * column `b` (as produced by [[boundariesSql]]).
    */
  def slicesSql(c: String, b: String): String =
    s"""CASE WHEN length($c) = 0 THEN CAST([] AS VARCHAR[]) ELSE
       |  list_transform(range(1, len($b)), k ->
       |    substring($c, CAST($b[k] + 1 AS INT), CAST($b[k + 1] - $b[k] AS INT)))
       |END""".stripMargin.replace("\n", " ")
}
