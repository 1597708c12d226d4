package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructType}

/** Aho–Corasick multi-pattern scan:
  * `multi_match(text, patterns)` → (n_hits, n_patterns) where n_hits
  * counts ALL occurrences of every pattern (overlapping included — the
  * classic AC output semantics) and n_patterns counts DISTINCT patterns
  * that occur at least once.
  *
  * This is the one-pass primitive a 100 TB blocklist filter needs: a
  * contaminant-phrase / banned-term table of thousands of entries scans
  * the corpus ONCE — per-character cost is O(1) amortized regardless of
  * pattern count, vs one LIKE/regex pass per pattern (10 k passes) or a
  * per-row automaton rebuild. The pattern side is a model literal in
  * every in-repo use, so the automaton is built ONCE per expression
  * instance and shipped to generated code as a reference object (the
  * [[PhraseMerge]] hoist discipline); a non-foldable pattern side falls
  * back to a per-row build.
  *
  * Matching is by Java char (UTF-16 code unit); for the ASCII patterns
  * every in-repo model uses, occurrence COUNTS are identical to
  * codepoint-indexed engines (a count is position-independent), which
  * is what the DuckDB gate pins.
  */
case class MultiMatch(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"multi_match requires (string, array<string>), got $l, $r")
    }

  override def dataType: DataType = MultiMatch.Schema
  override def prettyName: String = "multi_match"

  /** Automaton hoisted out of the per-row loop for foldable pattern
    * sides (always, in practice — blocklists are model literals).
    */
  @transient private lazy val staticAuto: MultiMatch.Automaton =
    if (right.foldable) {
      val arr = right.eval(null)
      if (arr == null) null
      else MultiMatch.build(arr.asInstanceOf[ArrayData])
    } else null

  override def nullSafeEval(text: Any, patterns: Any): Any = {
    val auto =
      if (staticAuto != null) staticAuto
      else MultiMatch.build(patterns.asInstanceOf[ArrayData])
    MultiMatch.run(text.toString, auto)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (staticAuto != null) {
      val autoRef = ctx.addReferenceObj("acAuto", staticAuto, classOf[MultiMatch.Automaton].getName)
      defineCodeGen(ctx, ev, (t, _) => s"graft.plans.MultiMatch.run($t.toString(), $autoRef)")
    } else
      defineCodeGen(ctx, ev,
        (t, p) => s"graft.plans.MultiMatch.run($t.toString(), graft.plans.MultiMatch.build($p))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MultiMatch {

  val Schema: StructType = new StructType()
    .add("n_hits", LongType)
    .add("n_patterns", IntegerType)

  /** Goto/fail/output tables in flat arrays; transitions in a per-node
    * char→state hash map (pattern alphabets are tiny; a dense 64 k-wide
    * table per node would waste cache for nothing).
    */
  final class Automaton(
      val next: Array[java.util.HashMap[Character, Integer]],
      val fail: Array[Int],
      val outCount: Array[Int],   // own endings + outCount(fail) — total, precomputed
      val ownPats: Array[Array[Int]], // pattern ids ending exactly here
      val dictLink: Array[Int],   // nearest fail-chain node with own endings, else -1
      val nPatterns: Int) extends Serializable

  /** Spec instrumentation: automaton builds per scan — the hoist pin. */
  private[graft] val autoBuilds = new java.util.concurrent.atomic.AtomicLong

  def build(patterns: ArrayData): Automaton = {
    autoBuilds.incrementAndGet()
    val pats = Array.tabulate(patterns.numElements()) { i =>
      val u = patterns.getUTF8String(i)
      if (u == null) "" else u.toString
    }.filter(_.nonEmpty)
    val next = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // trie insert
    var pid = 0
    while (pid < pats.length) {
      var s = 0
      val p = pats(pid)
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        val t = next(s).get(c)
        if (t == null) {
          next += new java.util.HashMap[Character, Integer]()
          ends += Nil
          next(s).put(c, next.length - 1)
          s = next.length - 1
        } else s = t.intValue()
        i += 1
      }
      ends(s) = pid :: ends(s)
      pid += 1
    }
    val n = next.length
    val fail = new Array[Int](n)
    val outCount = new Array[Int](n)
    val ownPats = Array.tabulate(n)(i => ends(i).toArray)
    val dictLink = Array.fill(n)(-1)
    // BFS for fail links
    val queue = new java.util.ArrayDeque[Integer]()
    next(0).forEach { (_, v) => fail(v) = 0; queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      outCount(u) = ownPats(u).length + outCount(fail(u))
      dictLink(u) = if (ownPats(fail(u)).nonEmpty) fail(u) else dictLink(fail(u))
      next(u).forEach { (c, v) =>
        // fail(v): deepest proper suffix state with a c-transition
        var f = fail(u)
        var t = next(f).get(c)
        while (t == null && f != 0) { f = fail(f); t = next(f).get(c) }
        fail(v) = if (t != null && t.intValue() != v.intValue()) t.intValue() else 0
        queue.add(v)
      }
    }
    new Automaton(next.toArray, fail, outCount, ownPats, dictLink, pats.length)
  }

  /** Static so generated code calls it directly. One pass over the text;
    * n_hits via the precomputed suffix-chain totals (O(1)/char), the
    * distinct-pattern bitset via dict links (O(matched patterns)).
    */
  def run(text: String, a: Automaton): InternalRow = {
    var hits = 0L
    val seen = new Array[Boolean](a.nPatterns)
    var nSeen = 0
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var t = a.next(s).get(c)
      while (t == null && s != 0) { s = a.fail(s); t = a.next(s).get(c) }
      s = if (t != null) t.intValue() else 0
      hits += a.outCount(s)
      var node = if (a.ownPats(s).nonEmpty) s else a.dictLink(s)
      var chase = node >= 0 && nSeen < a.nPatterns
      while (chase) {
        val own = a.ownPats(node)
        var j = 0
        while (j < own.length) {
          if (!seen(own(j))) { seen(own(j)) = true; nSeen += 1 }
          j += 1
        }
        node = a.dictLink(node)
        chase = node >= 0 && nSeen < a.nPatterns
      }
      i += 1
    }
    val r = new GenericInternalRow(2)
    r.setLong(0, hits)
    r.setInt(1, nSeen)
    r
  }
}

/** `multi_replace(text, patterns, replacement)` — the SCRUB half of
  * the blocklist story ([[MultiMatch]] counts; this removes):
  * leftmost-LONGEST, non-overlapping replacement of every blocklist
  * phrase, the FlashText contract (Singh 2017) and what "remove
  * banned terms" actually means in a curation recipe — "scan slow"
  * must consume as one phrase where "scan" alone also matches, and
  * occurrences never overlap ("a a a" scrubs one "a a", keeps the
  * tail). One left-to-right pass; at each position the shared
  * [[MultiMatch.build]] trie walks to the deepest accepting state
  * (O(max-phrase-length) per position — blocklist phrases are a few
  * words, declared), then the cursor jumps past the match. The
  * automaton hoists per expression instance exactly like the counting
  * scan. Output: (clean, n_replaced). Per-row, shuffle-free.
  */
case class MultiReplace(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"multi_replace requires (string, array<string>, string), got $a, $b, $c")
    }

  override def dataType: DataType = MultiReplace.Schema
  override def prettyName: String = "multi_replace"

  @transient private lazy val staticAuto: MultiMatch.Automaton =
    if (second.foldable) {
      val arr = second.eval(null)
      if (arr == null) null
      else MultiMatch.build(arr.asInstanceOf[ArrayData])
    } else null

  override def nullSafeEval(text: Any, patterns: Any, repl: Any): Any = {
    val auto =
      if (staticAuto != null) staticAuto
      else MultiMatch.build(patterns.asInstanceOf[ArrayData])
    MultiReplace.run(text.toString, auto, repl.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (staticAuto != null) {
      val autoRef = ctx.addReferenceObj("acAuto", staticAuto,
        classOf[MultiMatch.Automaton].getName)
      defineCodeGen(ctx, ev, (t, _, r) =>
        s"graft.plans.MultiReplace.run($t.toString(), $autoRef, $r.toString())")
    } else
      defineCodeGen(ctx, ev, (t, p, r) =>
        s"graft.plans.MultiReplace.run($t.toString(), " +
          s"graft.plans.MultiMatch.build($p), $r.toString())")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MultiReplace {

  val Schema: StructType = new StructType()
    .add("clean", org.apache.spark.sql.types.StringType)
    .add("n_replaced", LongType)

  /** Static so generated code calls it directly. Leftmost-longest,
    * non-overlapping, single pass.
    */
  def run(text: String, a: MultiMatch.Automaton, repl: String): InternalRow = {
    val sb = new java.lang.StringBuilder(text.length)
    var replaced = 0L
    var i = 0
    while (i < text.length) {
      // trie walk from the root at position i: deepest accepting depth
      var s = 0
      var j = i
      var bestEnd = -1
      var cont = true
      while (cont && j < text.length) {
        val t = a.next(s).get(text.charAt(j))
        if (t == null) cont = false
        else {
          s = t.intValue()
          if (a.ownPats(s).nonEmpty) bestEnd = j + 1
          j += 1
        }
      }
      if (bestEnd > i) {
        sb.append(repl)
        replaced += 1
        i = bestEnd
      } else {
        sb.append(text.charAt(i))
        i += 1
      }
    }
    val r = new GenericInternalRow(2)
    r.update(0, org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
    r.setLong(1, replaced)
    r
  }
}
