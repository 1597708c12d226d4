package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi unigram-LM segmentation (the SentencePiece inference step,
  * Kudo 2018): `unigram_segment(word, pieces, costs)` finds the
  * minimum-cost split of `word` into vocabulary pieces of length
  * 1..[[UnigramSegment.MaxPieceLen]], where each piece carries an integer
  * cost (−log₂ p, msb-quantized upstream). Ties on total cost prefer
  * FEWER pieces; both objectives ride one packed integer
  * (`packed = cost·64 + n_pieces`, n_pieces ≤ [[UnigramSegment.MaxWordLen]]
  * < 64, so minimizing packed IS the lexicographic (cost, pieces) min —
  * the same packing the DuckDB oracle unrolls, making the gate bit-exact
  * without tie-break ambiguity).
  *
  * Output: struct(cost_bits, n_pieces) — null fields for the empty
  * word, words beyond MaxWordLen, or a word no vocab path covers (cannot
  * happen when the model keeps all single characters, which the model
  * builder guarantees).
  *
  * The piece model is a (pieces[], costs[]) literal pair in every in-repo
  * use (the [[PhraseMerge]] model-collect discipline); foldable sides
  * build the probe map ONCE per expression instance and ship it to
  * generated code as a reference object — per-row cost is the DP alone:
  * O(len · MaxPieceLen) hash probes, no allocation beyond two length-16
  * arrays. Per-row, shuffle-free, whole-stage-codegen'd.
  */
case class UnigramSegment(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"unigram_segment requires (string, array<string>, array<bigint>), got $a, $b, $c")
    }

  override def dataType: DataType = UnigramSegment.Schema
  override def prettyName: String = "unigram_segment"

  @transient private lazy val staticMap: java.util.HashMap[UTF8String, java.lang.Long] =
    if (second.foldable && third.foldable) {
      val p = second.eval(null)
      val c = third.eval(null)
      if (p == null || c == null) null
      else UnigramSegment.buildMap(p.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
    } else null

  override def nullSafeEval(word: Any, pieces: Any, costs: Any): Any = {
    val map = if (staticMap != null) staticMap
      else UnigramSegment.buildMap(pieces.asInstanceOf[ArrayData], costs.asInstanceOf[ArrayData])
    UnigramSegment.compute(word.asInstanceOf[UTF8String], map)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (staticMap != null) {
      val mapRef = ctx.addReferenceObj("pieceMap", staticMap, "java.util.HashMap")
      defineCodeGen(ctx, ev,
        (w, _, _) => s"graft.plans.UnigramSegment.compute($w, $mapRef)")
    } else
      defineCodeGen(ctx, ev, (w, p, c) =>
        s"graft.plans.UnigramSegment.compute($w, graft.plans.UnigramSegment.buildMap($p, $c))")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object UnigramSegment {

  /** Longest vocabulary piece considered at each DP position. */
  val MaxPieceLen = 4

  /** Words longer than this are out of contract (the model builder
    * excludes them from the corpus vocabulary too). Also bounds n_pieces
    * under the ·64 packing.
    */
  val MaxWordLen = 16

  val Schema: StructType = new StructType()
    .add("cost_bits", LongType)
    .add("n_pieces", LongType)

  private val Inf = Long.MaxValue / 4

  def buildMap(pieces: ArrayData, costs: ArrayData): java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = pieces.numElements()
    require(costs.numElements() == m, "pieces/costs length mismatch")
    val map = new java.util.HashMap[UTF8String, java.lang.Long](math.max(4, m * 2))
    var i = 0
    while (i < m) { map.put(pieces.getUTF8String(i), java.lang.Long.valueOf(costs.getLong(i))); i += 1 }
    map
  }

  private def nulls: InternalRow = {
    val r = new GenericInternalRow(2)
    r.setNullAt(0); r.setNullAt(1)
    r
  }

  /** Static so generated code calls it directly. Character positions are
    * code points (UTF8String.substring semantics — matching SQL
    * `substring` on both engines).
    */
  def compute(word: UTF8String, map: java.util.HashMap[UTF8String, java.lang.Long]): InternalRow = {
    if (word == null) return nulls
    val n = word.numChars()
    if (n == 0 || n > MaxWordLen) return nulls
    val best = new Array[Long](n + 1)
    var i = 1
    while (i <= n) { best(i) = Inf; i += 1 }
    i = 1
    while (i <= n) {
      var k = 1
      val kMax = math.min(MaxPieceLen, i)
      while (k <= kMax) {
        if (best(i - k) < Inf) {
          val c = map.get(word.substring(i - k, i))
          if (c != null) {
            val cand = best(i - k) + c.longValue() * 64L + 1L
            if (cand < best(i)) best(i) = cand
          }
        }
        k += 1
      }
      i += 1
    }
    if (best(n) >= Inf) return nulls
    val r = new GenericInternalRow(2)
    r.setLong(0, best(n) / 64L)
    r.setLong(1, best(n) % 64L)
    r
  }
}
