package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §5 relative-reference resolution — the half of link
  * extraction [[graft.text.Urls]] leaves out: most `href`s in real
  * HTML are RELATIVE (`../p`, `/abs`, `//host/x`, `?q`, `#frag`), and
  * a link graph built without resolving them against the page URL is
  * mostly broken edges. `resolve_url(base, ref)` implements the
  * normative algorithm: scheme/authority/path/query splitting, the
  * five reference classes (§5.2.2), path merge (§5.3), and
  * remove_dot_segments (§5.2.4).
  *
  * Correctness is pinned two ways: golden equivalence against
  * `java.net.URI.resolve` — the JDK's independent implementation —
  * across the reference-class cross-product including the RFC's own
  * §5.4 examples (documented divergence: for an EMPTY reference the
  * JDK follows RFC 2396 and this follows RFC 3986 — base minus
  * fragment), and a DuckDB gate restating planted shapes closed-form.
  * Per-row, shuffle-free, codegen.
  */
case class ResolveUrl(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"resolve_url requires (string, string), got $l, $r")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "resolve_url"

  override def nullSafeEval(base: Any, ref: Any): Any =
    UTF8String.fromString(ResolveUrl.resolve(
      base.asInstanceOf[UTF8String].toString,
      ref.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, r) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.ResolveUrl.resolve($b.toString(), $r.toString()))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ResolveUrl {

  /** (scheme, authority, path, query, fragment) — any part null when
    * absent; authority WITHOUT the leading `//`.
    */
  private def split(u: String): (String, String, String, String, String) = {
    var rest = u
    var fragment: String = null
    val h = rest.indexOf('#')
    if (h >= 0) { fragment = rest.substring(h + 1); rest = rest.substring(0, h) }
    var query: String = null
    val q = rest.indexOf('?')
    if (q >= 0) { query = rest.substring(q + 1); rest = rest.substring(0, q) }
    var scheme: String = null
    val c = rest.indexOf(':')
    if (c > 0 && rest.substring(0, c).forall(ch =>
      ch.isLetterOrDigit || ch == '+' || ch == '-' || ch == '.') &&
      rest.charAt(0).isLetter) {
      scheme = rest.substring(0, c); rest = rest.substring(c + 1)
    }
    var authority: String = null
    if (rest.startsWith("//")) {
      val end = rest.indexWhere(ch => ch == '/', 2) match {
        case -1 => rest.length
        case e => e
      }
      authority = rest.substring(2, end); rest = rest.substring(end)
    }
    (scheme, authority, rest, query, fragment)
  }

  /** RFC 3986 §5.2.4. */
  def removeDotSegments(path: String): String = {
    val out = new StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        val slash = out.lastIndexOf("/")
        out.setLength(if (slash >= 0) slash else 0)
      }
      else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', from)
        val seg = if (next >= 0) in.substring(0, next) else in
        out.append(seg)
        in = if (next >= 0) in.substring(next) else ""
      }
    }
    out.toString
  }

  /** RFC 3986 §5.3 merge. */
  private def merge(baseAuth: String, basePath: String, refPath: String): String =
    if (baseAuth != null && basePath.isEmpty) "/" + refPath
    else {
      val slash = basePath.lastIndexOf('/')
      if (slash >= 0) basePath.substring(0, slash + 1) + refPath else refPath
    }

  private def recompose(s: String, a: String, p: String, q: String, f: String): String = {
    val sb = new StringBuilder
    if (s != null) { sb.append(s).append(':') }
    if (a != null) { sb.append("//").append(a) }
    sb.append(p)
    if (q != null) { sb.append('?').append(q) }
    if (f != null) { sb.append('#').append(f) }
    sb.toString
  }

  /** Static so generated code calls it directly — §5.2.2 transform. */
  def resolve(base: String, ref: String): String = {
    val (bs, ba, bp, bq, _) = split(base)
    val (rs, ra, rp, rq, rf) = split(ref)
    if (rs != null)
      recompose(rs, ra, removeDotSegments(rp), rq, rf)
    else if (ra != null)
      recompose(bs, ra, removeDotSegments(rp), rq, rf)
    else if (rp.isEmpty)
      recompose(bs, ba, bp, if (rq != null) rq else bq, rf)
    else if (rp.startsWith("/"))
      recompose(bs, ba, removeDotSegments(rp), rq, rf)
    else
      recompose(bs, ba, removeDotSegments(merge(ba, bp, rp)), rq, rf)
  }
}
