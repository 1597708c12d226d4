package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native ASOF join — the whole-operator path of the custom-operator
  * preference order (logical node → planner strategy → physical plan,
  * registered through `SparkSessionExtensions`), for the operator Spark
  * genuinely lacks: for every left row, the LATEST right row with
  * `right.ts <= left.ts` in the same key.
  *
  * Why a physical node when [[graft.ops.AsofJoin]] already composes the
  * semantics from union + window + last(ignoreNulls)? The composed plan
  * carries the union overhead (both sides padded to a common schema,
  * every right column walked by a window function) and materializes a
  * window frame per carried column; this node declares the SAME
  * distribution/ordering requirements a sort-merge join would
  * (cluster by key, sort by (key, ts) — Catalyst's EnsureRequirements
  * inserts the one hash exchange + sort per side) and then runs a
  * single O(n+m) interleaved merge per partition: one pointer pass,
  * one candidate row buffered per key, zero extra columns shuffled.
  * Semantics are pinned three ways: bit-equality with the composed
  * form on the fixture, the same DuckDB `ASOF LEFT JOIN` oracle gate,
  * and plan-shape specs (node present, one exchange per side, no
  * window).
  *
  * Scope: key and ts must be 64-bit-backed types (bigint / timestamp —
  * internally long micros); composite keys pre-pack (the repo-wide
  * packed-key idiom, e.g. [[graft.ops.Graph]]'s 2k/2k+1 node ids).
  * Null keys/timestamps never match, on either side — the DuckDB ASOF
  * comparison semantics.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override lazy val resolved: Boolean = childrenResolved

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, lts, rk, rts, payload) =>
      AsofJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, payload) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    payload: Seq[Attribute]) extends BinaryExecNode {

  private def longBacked(a: Attribute): Boolean =
    a.dataType == LongType || a.dataType == TimestampType

  require(Seq(leftKey, leftTs, rightKey, rightTs).forall(longBacked),
    "asof_join: key and ts must be bigint/timestamp (64-bit-backed)")

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  // Right side additionally sorts by every orderable payload column:
  // when several right rows share one (key, ts), the merge keeps the
  // LAST in sort order, so the tiebreaker makes the carried payload
  // deterministic (the maximal payload tuple) across runs and
  // parallelism instead of partition-arrival order.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      payload.filter(a => RowOrdering.isOrderable(a.dataType))
        .map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // the merge emits left rows in their incoming order
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0,
      "asof_join: key/ts attributes must come from the respective child")
    val payloadHere = payload
    val rightOut = right.output
    val leftOut = left.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadHere, rightOut)
      // the null-payload row must bind as NULLABLE even when the right
      // column was non-nullable — otherwise codegen skips the isNullAt
      // check and an unmatched row silently reads 0 instead of NULL
      val outProj = UnsafeProjection.create(outAttrs,
        leftOut ++ payloadHere.map(_.withNullability(true)))
      val nullPayload = new GenericInternalRow(payloadHere.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      var candKey = 0L
      var hasCand = false
      var candRow: InternalRow = null

      lIter.map { lRow =>
        val lkNull = lRow.isNullAt(lkOrd) || lRow.isNullAt(ltOrd)
        if (!lkNull) {
          val lk = lRow.getLong(lkOrd)
          val lt = lRow.getLong(ltOrd)
          // advance the right side through every row at-or-before (lk, lt)
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            if (head.isNullAt(rkOrd) || head.isNullAt(rtOrd)) {
              rBuf.next() // null keys/timestamps never match
            } else {
              val rk = head.getLong(rkOrd)
              val rt = head.getLong(rtOrd)
              if (rk < lk) rBuf.next() // stale key: no future left row wants it
              else if (rk == lk && rt <= lt) {
                // newest-so-far for this key — copy: the iterator reuses rows
                candRow = payloadProj(rBuf.next()).copy()
                candKey = lk
                hasCand = true
              } else advance = false
            }
          }
          val matched = hasCand && candKey == lk
          joined(lRow, if (matched) candRow else nullPayload)
        } else {
          joined(lRow, nullPayload)
        }
        outProj(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
