package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (RFC 9309 core) — the crawl-politeness gate a
  * pipeline applies before fetching, and re-applies when FILTERING an
  * already-crawled corpus against the current exclusion state:
  * `robots_allowed(robots_txt, agent, path)` → 1/0.
  *
  * Semantics implemented (the RFC's normative core):
  * - groups: one or more `User-agent` lines followed by rules; the
  *   most specific matching group applies — the agent's own group if
  *   any line names it (case-insensitive product token match),
  *   otherwise the `*` group; NON-matching groups are ignored entirely.
  * - rules: `Allow`/`Disallow` path patterns matched case-sensitively
  *   from the path start, with the RFC's wildcards: `*` matches any
  *   character run (including `/`), a FINAL `$` anchors the pattern to
  *   the path end (elsewhere `$` is literal); without `$` the pattern
  *   matches any path it prefixes. The most specific match wins —
  *   "most octets" measured as the rule's pattern length with wildcard
  *   octets counted (the published Google matcher's priority rule); at
  *   equal length Allow wins; no matching rule → allowed. An empty
  *   `Disallow:` matches nothing (the classic allow-all idiom).
  * - lines: directives case-insensitive, `#` comments stripped,
  *   whitespace trimmed, unknown directives skipped.
  *
  * Per-row parse (robots text is per-row DATA — the per-domain join
  * output — never a foldable model, so there is nothing to hoist);
  * per-row cost is one line scan + one rule scan. Shuffle-free,
  * whole-stage codegen.
  */
case class RobotsAllowed(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"robots_allowed requires (string, string, string), got $a, $b, $c")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "robots_allowed"

  override def nullSafeEval(robots: Any, agent: Any, path: Any): Any =
    RobotsAllowed.allowed(robots.asInstanceOf[UTF8String].toString,
      agent.asInstanceOf[UTF8String].toString,
      path.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, a, p) =>
      s"graft.plans.RobotsAllowed.allowed($r.toString(), $a.toString(), $p.toString())")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Politeness metadata from robots.txt: `robots_meta(robots, agent)` →
  * struct(crawl_delay_ms INT, sitemaps ARRAY<STRING>). Group selection
  * is IDENTICAL to [[RobotsAllowed]] (the agent's own group if any line
  * names it, else `*`); `Crawl-delay` is the first such line in a
  * matching group (seconds, fractional allowed → milliseconds, null
  * when absent/unparsable); `Sitemap` lines are group-INDEPENDENT per
  * the spec and return in file order. Per-row, map-only, codegen.
  */
case class RobotsMeta(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"robots_meta requires (string, string), got $a, $b")
    }

  override def dataType: DataType = RobotsMeta.Schema
  override def prettyName: String = "robots_meta"

  override def nullSafeEval(robots: Any, agent: Any): Any =
    RobotsMeta.meta(robots.asInstanceOf[UTF8String].toString,
      agent.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, a) =>
      s"graft.plans.RobotsMeta.meta($r.toString(), $a.toString())")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object RobotsMeta {

  val Schema: org.apache.spark.sql.types.StructType =
    new org.apache.spark.sql.types.StructType()
      .add("crawl_delay_ms", IntegerType)
      .add("sitemaps", org.apache.spark.sql.types.ArrayType(StringType, containsNull = false))

  /** Static so generated code calls it directly. Group selection is the
    * SHARED [[RobotsAllowed.walkDirectives]] — allowed() and meta() can
    * never disagree about which group applies.
    */
  def meta(robots: String, agent: String): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    var delayMs = -1
    val sitemaps = new scala.collection.mutable.ArrayBuffer[Any](2)
    RobotsAllowed.walkDirectives(robots, agent) { (dir, value, groupActive) =>
      if (dir == "sitemap" && value.nonEmpty)
        sitemaps += UTF8String.fromString(value)
      else if (dir == "crawl-delay" && groupActive && delayMs < 0)
        delayMs =
          try {
            val s = value.toDouble
            if (s >= 0 && s <= 1e6) Math.round(s * 1000.0).toInt else -1
          } catch { case _: NumberFormatException => -1 }
    }
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    if (delayMs >= 0) r.setInt(0, delayMs) else r.setNullAt(0)
    r.update(1, new org.apache.spark.sql.catalyst.util.GenericArrayData(sitemaps.toArray))
    r
  }
}

object RobotsAllowed {

  /** ONE definition of the RFC's group selection, shared by
    * [[allowed]] and [[RobotsMeta]]: parses lines, resolves the
    * most-specific group (the agent's own if any line names it, else
    * `*`), tracks agent-line runs (consecutive UA lines share rules; a
    * blank line does NOT end a group; any non-UA directive does end the
    * run), and invokes `f(dir, value, groupActive)` for every non-UA
    * directive with the active-group flag already computed.
    */
  private[plans] def walkDirectives(robots: String, agent: String)(
      f: (String, String, Boolean) => Unit): Unit = {
    val lines = robots.split("\n", -1)
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // pass 1: does ANY group name this agent?
    var hasOwn = false
    var i = 0
    while (i < lines.length && !hasOwn) {
      val (dir, value) = directive(lines(i))
      if (dir == "user-agent" && value.toLowerCase(java.util.Locale.ROOT) == agentLc)
        hasOwn = true
      i += 1
    }
    val wanted = if (hasOwn) agentLc else "*"
    var inAgents = false    // currently reading consecutive User-agent lines
    var groupActive = false // current group names `wanted`
    i = 0
    while (i < lines.length) {
      val (dir, value) = directive(lines(i))
      if (dir == "user-agent") {
        if (!inAgents) { inAgents = true; groupActive = false } // new group starts
        if (value.toLowerCase(java.util.Locale.ROOT) == wanted) groupActive = true
      } else if (dir != null) {
        inAgents = false // any non-UA directive ends the agent-line run
        f(dir, value, groupActive)
      }
      i += 1
    }
  }

  /** Static so generated code calls it directly. */
  def allowed(robots: String, agent: String, path: String): Int = {
    var bestLen = -1
    var bestAllow = true
    walkDirectives(robots, agent) { (dir, value, groupActive) =>
      if (dir == "allow" || dir == "disallow") {
        // empty Disallow matches nothing; empty Allow likewise (no effect)
        if (groupActive && value.nonEmpty && patMatch(value, path)) {
          val isAllow = dir == "allow"
          if (value.length > bestLen || (value.length == bestLen && isAllow && !bestAllow)) {
            if (value.length > bestLen) { bestLen = value.length; bestAllow = isAllow }
            else bestAllow = true // tie → Allow wins
          }
        }
      }
    }
    if (bestLen < 0 || bestAllow) 1 else 0
  }

  /** RFC 9309 §2.2.3 pattern match: does `pattern` (with `*` wildcards
    * and an optional final `$` anchor) match a prefix of `path` (the
    * whole path when anchored)? Greedy leftmost placement of each
    * wildcard segment is exact for this language: later segments can
    * only benefit from more remaining path.
    */
  private[plans] def patMatch(pattern: String, path: String): Boolean = {
    val anchored = pattern.length > 0 && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val parts = pat.split("\\*", -1)
    if (!path.startsWith(parts(0))) return false
    var pos = parts(0).length
    var i = 1
    while (i < parts.length) {
      val part = parts(i)
      if (i == parts.length - 1 && anchored) {
        // final segment must sit flush at the path end, at or after pos
        return path.length - part.length >= pos && path.endsWith(part)
      }
      val idx = path.indexOf(part, pos)
      if (idx < 0) return false
      pos = idx + part.length
      i += 1
    }
    if (anchored) pos == path.length // no '*' in pattern: exact match
    else true
  }

  /** (lowercased directive, trimmed value) or (null, null) for blank /
    * comment-only / malformed lines.
    */
  private def directive(raw: String): (String, String) = {
    val hash = raw.indexOf('#')
    val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
    if (line.isEmpty) return (null, null)
    val colon = line.indexOf(':')
    if (colon < 0) return (null, null)
    (line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT),
      line.substring(colon + 1).trim)
  }
}
