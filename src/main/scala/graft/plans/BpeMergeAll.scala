package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply an ENTIRE rank-ordered BPE merge table in one expression:
  * `bpe_merge_all(tokens)` rewrites a token array by applying each merge
  * rule, in rank order, as one greedy left-to-right non-overlapping pass
  * (the [[PhraseMerge]] single-rule semantics, iterated internally).
  *
  * Why this exists: composing one nested [[PhraseMerge]] PER RULE makes
  * the expression tree as deep as the merge table — fine at a toy m=8,
  * but a real tokenizer ships ~50 k merges, where analyzer cost is
  * superlinear in depth and codegen overflows the JVM's 64 KB method
  * limit into interpreted fallback. Here the table lives in ONE
  * expression whose depth is constant in m: the rank map is built once
  * at construction (the merge table is a driver-collected model literal,
  * never per-row data — the [[graft.text.Phrases]] collect discipline)
  * and shipped to generated code as a reference object.
  *
  * Per-row cost is independent of m: each round scans the current array
  * once (one hash probe per adjacent pair) to find the LOWEST rank still
  * applicable above the last applied rank, then runs that rule's greedy
  * pass. Rules whose pair never occurs in the row cost nothing — exactly
  * the no-op they are in the nested form — so a 50 k-rule table costs a
  * short word only its handful of applicable rounds. Rounds are bounded
  * by the row's token count (each applied rule shrinks the array), so
  * the worst case is O(n²) hash probes in the TOKEN count n, never m·n.
  *
  * Contract (pinned by `HygieneBpeSpec` equivalence vs the nested form):
  * identical output to `merges.foldLeft(toks)(PhraseMerge(_, rule, ""))`
  * — strict rank order, one pass per rule, no revisiting earlier ranks
  * when a later merge creates one of their pairs.
  */
case class BpeMergeAll(child: Expression, merges: Seq[String], sep: String = "")
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge_all requires array<string>, got $dt")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge_all"

  // built once per expression instance, shared across all rows and, via
  // addReferenceObj, across generated code — never rebuilt per row
  @transient private lazy val ranks: java.util.HashMap[UTF8String, Integer] =
    BpeMergeAll.buildRanks(merges)

  @transient private lazy val sepU: UTF8String = UTF8String.fromString(sep)

  override def nullSafeEval(toks: Any): Any =
    BpeMergeAll.compute(toks.asInstanceOf[ArrayData], ranks, sepU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
    val sepRef = ctx.addReferenceObj("sep", sepU)
    defineCodeGen(ctx, ev,
      c => s"graft.plans.BpeMergeAll.compute($c, $ranksRef, $sepRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeMergeAll {

  private val Space = UTF8String.fromString(" ")

  /** 1-based rank per `"a b"` pair; first occurrence wins (merge tables
    * are distinct by construction — groupBy — so duplicates never arise).
    */
  def buildRanks(merges: Seq[String]): java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](math.max(4, merges.size * 2))
    merges.zipWithIndex.foreach { case (p, i) =>
      m.putIfAbsent(UTF8String.fromString(p), Integer.valueOf(i + 1))
    }
    m
  }

  /** Static so generated code can call it. */
  def compute(toksData: ArrayData,
      ranks: java.util.HashMap[UTF8String, Integer],
      sep: UTF8String): ArrayData = {
    val n0 = toksData.numElements()
    val cur = new Array[UTF8String](n0)
    var i = 0
    while (i < n0) { cur(i) = toksData.getUTF8String(i); i += 1 }
    var len = n0
    var lastRank = 0
    var done = len < 2
    while (!done) {
      // lowest applicable rank STRICTLY ABOVE the last applied one: ranks
      // at or below it already had their single pass (possibly a no-op)
      // in the nested-form order and are never revisited
      var minRank = Int.MaxValue
      i = 0
      while (i < len - 1) {
        val r = ranks.get(UTF8String.concat(cur(i), Space, cur(i + 1)))
        if (r != null && r.intValue > lastRank && r.intValue < minRank)
          minRank = r.intValue
        i += 1
      }
      if (minRank == Int.MaxValue) done = true
      else {
        // that rule's one greedy left-to-right non-overlapping pass
        var w = 0
        i = 0
        while (i < len) {
          if (i + 1 < len && {
            val r = ranks.get(UTF8String.concat(cur(i), Space, cur(i + 1)))
            r != null && r.intValue == minRank
          }) {
            cur(w) = UTF8String.concat(cur(i), sep, cur(i + 1)); w += 1; i += 2
          } else {
            cur(w) = cur(i); w += 1; i += 1
          }
        }
        len = w
        lastRank = minRank
        done = len < 2
      }
    }
    val out = new Array[UTF8String](len)
    System.arraycopy(cur, 0, out, 0, len)
    new GenericArrayData(out)
  }
}
