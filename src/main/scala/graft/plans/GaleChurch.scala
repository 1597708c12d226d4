package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StructType}

/** Sentence/segment alignment by length (Gale & Church 1993, "A Program
  * for Aligning Sentences in Bilingual Corpora"), reduced to the
  * INTEGER-exact core the correctness gate can cross-check: dynamic
  * programming over two segment-length arrays with the classic bead
  * moves 1-1, 2-1, 1-2, 0-1, 1-0, where a substitution bead costs the
  * absolute length difference of its sides and the non-1-1 beads add
  * constant integer penalties ([[GaleChurchAlign.MergePenalty]] /
  * [[GaleChurchAlign.SkipPenalty]]). The original's Gaussian
  * log-likelihood cost needs floats and a length-ratio model — exactly
  * the part that can never be bit-stable across engines — so the X52
  * moment discipline applies: every cost, comparison, and boundary here
  * is integer arithmetic, and the oracle enumerates the planted optimal
  * alignment in closed form.
  *
  * `gale_church_align(a_lens, b_lens)` → array of beads
  * `struct<a_start, a_count, b_start, b_count>` in order; starts are
  * 0-based offsets into the input arrays, counts may be 0 (insertion /
  * deletion beads). Ties break deterministically by move order
  * (1-1 > 2-1 > 1-2 > 0-1 > 1-0). 2-2 beads — rare enough that Gale &
  * Church report them at under 0.2% of real bitext — are not modeled;
  * a 2-2 region resolves as two beads through the skip moves.
  *
  * Per-row, shuffle-free; DP cost O(n·m) in the two documents'
  * segment counts — bounded by one cluster pair, never the corpus.
  * Reference scope: the reference has no alignment surface; this is
  * north-star parallel-text mining (the step that turns X163's
  * hreflang clusters into translation training pairs).
  */
case class GaleChurchAlign(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"gale_church_align requires two array<int> inputs, got $l / $r")
    }

  override def dataType: DataType = GaleChurchAlign.Schema
  override def prettyName: String = "gale_church_align"

  override def nullSafeEval(a: Any, b: Any): Any =
    GaleChurchAlign.align(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GaleChurchAlign.align($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GaleChurchAlign {

  val Schema: DataType = ArrayType(new StructType()
    .add("a_start", IntegerType, nullable = false)
    .add("a_count", IntegerType, nullable = false)
    .add("b_start", IntegerType, nullable = false)
    .add("b_count", IntegerType, nullable = false), containsNull = false)

  /** Extra cost of a 2-1 / 1-2 bead over the pure length mismatch —
    * small, so a true merge (summed lengths match) beats misaligned
    * 1-1 chains, but a gratuitous merge never beats two clean 1-1s.
    */
  val MergePenalty = 2L

  /** Cost of an unmatched segment (0-1 / 1-0). High relative to
    * typical in-bead length noise: dropping a segment must be the
    * LAST resort, not a shortcut past a mediocre match.
    */
  val SkipPenalty = 50L

  private final val NoMove = -1
  // move encoding: da*3 + db (da, db = segments consumed on each side)
  private final val M11 = 1 * 3 + 1
  private final val M21 = 2 * 3 + 1
  private final val M12 = 1 * 3 + 2
  private final val M01 = 0 * 3 + 1
  private final val M10 = 1 * 3 + 0

  /** Static so generated code calls it directly. */
  def align(aData: ArrayData, bData: ArrayData): ArrayData = {
    val n = aData.numElements()
    val m = bData.numElements()
    val a = new Array[Long](n)
    val b = new Array[Long](m)
    var i = 0
    while (i < n) { a(i) = aData.getInt(i).toLong; i += 1 }
    i = 0
    while (i < m) { b(i) = bData.getInt(i).toLong; i += 1 }

    // DP over (n+1)×(m+1); move order below is the deterministic
    // tie-break (strict < to replace, so the first-listed move wins)
    val cost = Array.fill[Long]((n + 1) * (m + 1))(Long.MaxValue)
    val back = Array.fill[Int]((n + 1) * (m + 1))(NoMove)
    def idx(x: Int, y: Int): Int = x * (m + 1) + y
    cost(0) = 0L
    var x = 0
    while (x <= n) {
      var y = 0
      while (y <= m) {
        val c = cost(idx(x, y))
        if (c != Long.MaxValue) {
          def relax(dx: Int, dy: Int, step: Long, move: Int): Unit = {
            val t = idx(x + dx, y + dy)
            if (c + step < cost(t)) { cost(t) = c + step; back(t) = move }
          }
          if (x < n && y < m) relax(1, 1, math.abs(a(x) - b(y)), M11)
          if (x + 1 < n && y < m)
            relax(2, 1, math.abs(a(x) + a(x + 1) - b(y)) + MergePenalty, M21)
          if (x < n && y + 1 < m)
            relax(1, 2, math.abs(a(x) - b(y) - b(y + 1)) + MergePenalty, M12)
          if (y < m) relax(0, 1, SkipPenalty, M01)
          if (x < n) relax(1, 0, SkipPenalty, M10)
        }
        y += 1
      }
      x += 1
    }

    // walk back from (n, m), then reverse into bead order
    val beads = scala.collection.mutable.ArrayBuffer.empty[InternalBead]
    var cx = n
    var cy = m
    while (cx > 0 || cy > 0) {
      val mv = back(idx(cx, cy))
      val da = mv / 3
      val db = mv % 3
      beads += InternalBead(cx - da, da, cy - db, db)
      cx -= da
      cy -= db
    }
    val out = new Array[Any](beads.length)
    i = 0
    val k = beads.length
    while (i < k) {
      val bead = beads(k - 1 - i)
      val r = new GenericInternalRow(4)
      r.setInt(0, bead.aStart); r.setInt(1, bead.aCount)
      r.setInt(2, bead.bStart); r.setInt(3, bead.bCount)
      out(i) = r
      i += 1
    }
    new GenericArrayData(out)
  }

  private case class InternalBead(aStart: Int, aCount: Int, bStart: Int, bCount: Int)
}
