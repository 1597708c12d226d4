package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `wordpiece_encode(word, vocab)` — greedy longest-match-first subword
  * tokenization (the BERT tokenizer's inference rule; Wu et al. 2016):
  * from position p, take the LONGEST vocabulary piece matching the
  * remaining characters — pieces at p = 0 probe raw, pieces at p > 0
  * probe with the `##` continuation prefix — and repeat; a position no
  * piece covers (or a word longer than [[WordpieceEncode.MaxWordLen]])
  * maps the WHOLE word to `[UNK]`, the real WordPiece rule. Completes
  * the tokenizer family: BPE's merge walk (X45/X77), unigram's Viterbi
  * DP (X104), and now the greedy matcher — three inference rules, one
  * model-collect discipline.
  *
  * The vocabulary arrives as ONE string array whose continuation
  * entries carry their `##` prefix (so role lookup is a prefix choice,
  * not a second structure); a foldable vocab side builds the probe set
  * once per expression instance (the UnigramSegment hoisting). Output:
  * struct(n_pieces, encoded) with pieces space-joined. Per-row,
  * shuffle-free, codegen via a static call; cost O(len · MaxPieceLen)
  * hash probes.
  */
case class WordpieceEncode(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"wordpiece_encode requires (string, array<string>), got $a, $b")
    }

  override def dataType: DataType = WordpieceEncode.Schema
  override def prettyName: String = "wordpiece_encode"

  @transient private lazy val staticSet: java.util.HashSet[String] =
    if (right.foldable) {
      val v = right.eval(null)
      if (v == null) null else WordpieceEncode.buildSet(v.asInstanceOf[ArrayData])
    } else null

  override def nullSafeEval(word: Any, vocab: Any): Any = {
    val set = if (staticSet != null) staticSet
      else WordpieceEncode.buildSet(vocab.asInstanceOf[ArrayData])
    WordpieceEncode.compute(word.asInstanceOf[UTF8String], set)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (staticSet != null) {
      val setRef = ctx.addReferenceObj("wpSet", staticSet, "java.util.HashSet")
      defineCodeGen(ctx, ev, (w, _) =>
        s"graft.plans.WordpieceEncode.compute($w, $setRef)")
    } else
      defineCodeGen(ctx, ev, (w, v) =>
        s"graft.plans.WordpieceEncode.compute($w, graft.plans.WordpieceEncode.buildSet($v))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordpieceEncode {

  val MaxPieceLen = 4
  val MaxWordLen = 16
  val Unk = "[UNK]"

  val Schema: StructType = new StructType()
    .add("n_pieces", IntegerType)
    .add("encoded", StringType)

  def buildSet(arr: ArrayData): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) {
      s.add(arr.getUTF8String(i).toString)
      i += 1
    }
    s
  }

  /** Static for codegen. Never null (the UNK rule is total). */
  def compute(wordU: UTF8String, vocab: java.util.HashSet[String]): InternalRow = {
    val word = wordU.toString
    val n = word.length
    val out = new GenericInternalRow(2)
    def unk(): InternalRow = {
      out.setInt(0, 1)
      out.update(1, UTF8String.fromString(Unk))
      out
    }
    if (n == 0 || n > MaxWordLen) return unk()
    val sb = new java.lang.StringBuilder(n + 8)
    var p = 0
    var pieces = 0
    while (p < n) {
      var l = math.min(MaxPieceLen, n - p)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand =
          if (p == 0) word.substring(0, l)
          else "##" + word.substring(p, p + l)
        if (vocab.contains(cand)) hit = cand else l -= 1
      }
      if (hit == null) return unk()
      if (pieces > 0) sb.append(' ')
      sb.append(hit)
      pieces += 1
      p += (if (p == 0) hit.length else hit.length - 2)
    }
    out.setInt(0, pieces)
    out.update(1, UTF8String.fromString(sb.toString))
    out
  }
}
