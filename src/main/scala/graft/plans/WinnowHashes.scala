package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Robust winnowing fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003) in one pass:
  * hash every character `k`-gram (the same Horner-mod polynomial as
  * [[NGramPolyHash]]), slide a window of `w` consecutive hashes, and select
  * each window's minimum (rightmost on ties). The distinct selected values
  * are the document's fingerprint set.
  *
  * The winnowing guarantee: any shared substring of length ≥ `k + w − 1`
  * yields at least one shared selected fingerprint, while expected
  * fingerprint density is only `2/(w+1)` of positions — the sub-document
  * match granularity plagiarism/citation detection runs on, sparser and
  * match-length-guaranteed where [[CdcChunks]] is boundary-random.
  *
  * One scan per row, O(w) per window (w is small; no deque needed), a
  * hash set for the distinct output — no per-window allocation. Codegen'd
  * via a static call like the other graft expressions.
  */
case class WinnowHashes(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && w >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_hashes requires (string, k>=1, w>=1), got ${child.dataType}, k=$k, w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_hashes"

  override def nullSafeEval(input: Any): Any =
    WinnowHashes.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WinnowHashes.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowHashes {
  val P: Long = HashConstants.P
  val B: Long = HashConstants.B

  /** Default char-gram length. Long enough (~3 words of the fixture's
    * vocabulary) that background word-soup similarity doesn't saturate
    * every fingerprint; real corpora could drop to ~8.
    */
  val DefaultK = 16

  /** Default winnow window: guarantee threshold t = k + w − 1 = 23 chars;
    * expected density 2/(w+1) ≈ 22% of positions.
    */
  val DefaultW = 8

  /** Distinct selected hashes, insertion-ordered. If the k-gram count m
    * satisfies 0 < m < w the whole sequence is ONE window (its min is
    * selected) — the natural degenerate case; m ≤ 0 → empty.
    */
  def selectedOf(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val cps = s.toString.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return Array.emptyLongArray
    val kh = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * B + cps(i + j)) % P; j += 1 }
      kh(i) = h
      i += 1
    }
    val ww = math.min(w, m)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var s0 = 0
    while (s0 <= m - ww) {
      var minIdx = s0
      var j = s0
      while (j < s0 + ww) { // `<=` keeps the RIGHTMOST minimum (robust winnowing)
        if (kh(j) <= kh(minIdx)) minIdx = j
        j += 1
      }
      seen.add(kh(minIdx))
      s0 += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = it.next(); n += 1 }
    out
  }

  def compute(s: UTF8String, k: Int, w: Int): ArrayData =
    new GenericArrayData(selectedOf(s, k, w))

  /** DuckDB twin: positional k-gram hashes (NO distinct — winnowing is
    * positional), per-window rightmost-min selection via `list_max` over
    * tie positions, then a distinct list. O(w²) per window — oracle-only
    * cost; the Spark side is the one-pass loop above.
    */
  def sql(c: String, k: Int = DefaultK, w: Int = DefaultW): String = {
    val folded = (0 until k).foldLeft("CAST(0 AS BIGINT)") { (acc, j) =>
      s"(($acc) * $B + ascii(substring($c, i + $j, 1))) % $P"
    }
    val kh = s"list_transform(range(1, greatest(length($c) - ${k - 2}, 1)), i -> $folded)"
    // bind kh/ww once per row via a scalar subquery-free struct trick:
    // callers wrap this in a CTE that names kh and ww (see Winnow oracle)
    kh
  }
}
