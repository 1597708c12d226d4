package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy left-to-right non-overlapping phrase merge:
  * `phrase_merge(tokens, phrases)` rewrites a token array joining each
  * adjacent pair whose `"a b"` string is in `phrases` into one `"a_b"`
  * token, consuming both (a merged token never participates in a second
  * merge in the same pass — the word2vec/gensim Phrases semantics).
  *
  * This is the codegen'd primitive behind [[graft.text.Phrases]]: the
  * composable twin (an `aggregate` fold) evaluates OUTSIDE whole-stage
  * codegen and allocates an accumulator array per step — O(n²)
  * per-row allocation that a 50 k-doc fixture tolerates but 100 TB does
  * not (the RollingPolyHash precedent). Here the row is scanned once,
  * each step is one hash-set probe, and output strings are shared
  * UTF8String concats. The phrase side is a model literal in every
  * in-repo use ([[graft.text.Phrases]] collects ≤ MaxPhrases rows), so
  * the probe set is built ONCE per expression instance and shipped to
  * generated code as a reference object — per-row cost is flat in the
  * model size m, which is what lets the same primitive carry a real
  * ~100 k-phrase table. A non-foldable phrase side falls back to the
  * per-row build.
  *
  * The SEMANTICS (not the implementation) are the cross-engine contract:
  * the DuckDB oracle computes the identical greedy merge relationally
  * (run-parity over islands of consecutive qualifying pairs), so the
  * gate stays bit-exact — see `Phrases.mergeCte`.
  */
case class PhraseMerge(left: Expression, right: Expression, sep: String = "_")
  extends BinaryExpression {

  private def isStringArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(left.dataType) && isStringArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"phrase_merge requires (array<string>, array<string>), got " +
        s"${left.dataType}, ${right.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "phrase_merge"

  /** The phrase set, hoisted out of the per-row loop when the phrase
    * side is FOLDABLE — which it always is in practice: phrase tables
    * are driver-collected model literals ([[graft.text.Phrases]]'s
    * collect discipline). Built once per (deserialized) expression
    * instance instead of m inserts × corpus rows — at a real ~100 k-
    * phrase model the per-row rebuild would dominate the scan it
    * decorates. Null when the phrase side is genuinely per-row data
    * (the compute-per-row fallback below).
    */
  @transient private lazy val staticSet: java.util.HashSet[UTF8String] =
    if (right.foldable) {
      val arr = right.eval(null)
      if (arr == null) null
      else PhraseMerge.buildSet(arr.asInstanceOf[ArrayData])
    } else null

  @transient private lazy val sepU: UTF8String = UTF8String.fromString(sep)

  override def nullSafeEval(toks: Any, phrases: Any): Any =
    if (staticSet != null)
      PhraseMerge.computeWithSet(toks.asInstanceOf[ArrayData], staticSet, sepU)
    else
      PhraseMerge.compute(toks.asInstanceOf[ArrayData], phrases.asInstanceOf[ArrayData],
        sepU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sepU)
    if (staticSet != null) {
      val setRef = ctx.addReferenceObj("phraseSet", staticSet, "java.util.HashSet")
      defineCodeGen(ctx, ev,
        (t, _) => s"graft.plans.PhraseMerge.computeWithSet($t, $setRef, $sepRef)")
    } else
      defineCodeGen(ctx, ev, (t, p) => s"graft.plans.PhraseMerge.compute($t, $p, $sepRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PhraseMerge {

  private val Space = UTF8String.fromString(" ")

  /** Spec instrumentation: how many times a phrase set was built.
    * `PhrasesSpec` pins that a foldable phrase side builds O(1) sets for
    * a whole scan (the hoist), never one per row.
    */
  private[graft] val setBuilds = new java.util.concurrent.atomic.AtomicLong

  private[plans] def buildSet(phrases: ArrayData): java.util.HashSet[UTF8String] = {
    setBuilds.incrementAndGet()
    val m = phrases.numElements()
    val set = new java.util.HashSet[UTF8String](math.max(4, m * 2))
    var j = 0
    while (j < m) { set.add(phrases.getUTF8String(j)); j += 1 }
    set
  }

  /** Static so generated code can call it — the per-row fallback for a
    * NON-foldable phrase side (set rebuilt per row; rare in practice).
    * One scan, one set probe per position, no per-step accumulator
    * allocation. `sep` joins the merged pair: "_" for word phrases
    * (new_york), "" for BPE subword merges (t+h → th).
    */
  def compute(toks: ArrayData, phrases: ArrayData, sep: UTF8String): ArrayData =
    computeWithSet(toks, buildSet(phrases), sep)

  /** Static so generated code can call it: the merge scan against an
    * already-built (hoisted) phrase set.
    */
  def computeWithSet(toks: ArrayData, set: java.util.HashSet[UTF8String],
      sep: UTF8String): ArrayData = {
    val n = toks.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (i + 1 < n && set.contains(UTF8String.concat(t, Space, toks.getUTF8String(i + 1)))) {
        out.add(UTF8String.concat(t, sep, toks.getUTF8String(i + 1)))
        i += 2
      } else {
        out.add(t)
        i += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())))
  }
}
