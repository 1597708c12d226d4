package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Internationalized domain names — RFC 3492 Punycode per label: the
  * web's hosts are Unicode in hrefs and sitemaps but ASCII in DNS, and
  * a frontier that doesn't normalize `bücher.example` to
  * `xn--bcher-kva.example` treats the SAME host as two politeness
  * budgets, two robots files, two mirror candidates. Two directions:
  *
  *  - `idn_ascii(host)`: lowercase, then per label encode any
  *    non-ASCII label as `xn--` + Punycode (RFC 3492 §6.3) — the DNS
  *    registry form, the canonical crawl key;
  *  - `idn_unicode(host)`: per label decode `xn--` labels (§6.2) —
  *    the display form.
  *
  * Declared simplification vs full IDNA: the mapping step is
  * LOWERCASE-ONLY (no nameprep/UTS46 width folding) — for
  * already-lowercase input the two agree, and the spec pins exact
  * agreement with `java.net.IDN` (the JDK's independent
  * implementation) on randomized multi-script labels. Malformed
  * `xn--` labels decode to themselves (crawl-tolerant, the
  * [[PctNormalize]] discipline). Per-row, shuffle-free, codegen.
  */
case class IdnAscii(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"idn_ascii requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "idn_ascii"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Idn.toAsciiHost(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.Idn.toAsciiHost($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class IdnUnicode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"idn_unicode requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "idn_unicode"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Idn.toUnicodeHost(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.Idn.toUnicodeHost($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Idn {

  // RFC 3492 §5 parameters
  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private def adapt(deltaIn: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) deltaIn / Damp else deltaIn / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + ((Base - TMin + 1) * delta) / (delta + Skew)
  }

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def digitVal(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  /** RFC 3492 §6.3 encode of a code-point sequence (no xn-- prefix). */
  def punycodeEncode(input: Array[Int]): String = {
    val out = new java.lang.StringBuilder
    input.foreach(cp => if (cp < 128) out.append(cp.toChar))
    val b = out.length()
    var h = b
    if (b > 0) out.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    while (h < input.length) {
      var m = Int.MaxValue
      input.foreach(cp => if (cp >= n && cp < m) m = cp)
      delta += (m - n) * (h + 1) // inputs are hostname-sized: no overflow
      n = m
      input.foreach { cp =>
        if (cp < n) delta += 1
        else if (cp == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
            if (q < t) done = true
            else {
              out.append(digitChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          out.append(digitChar(q))
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
      }
      delta += 1
      n += 1
    }
    out.toString
  }

  /** RFC 3492 §6.2 decode (no xn-- prefix); null on malformed input. */
  def punycodeDecode(input: String): String = {
    val out = new java.util.ArrayList[Integer]
    val lastDelim = input.lastIndexOf('-')
    var pos = 0
    if (lastDelim > 0) {
      while (pos < lastDelim) {
        val c = input.charAt(pos)
        if (c >= 128) return null
        out.add(c.toInt)
        pos += 1
      }
      pos = lastDelim + 1
    } else if (lastDelim == 0) pos = 1
    var n = InitialN
    var i = 0
    var bias = InitialBias
    while (pos < input.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (pos >= input.length) return null
        val digit = digitVal(input.charAt(pos))
        pos += 1
        if (digit < 0) return null
        i += digit * w
        if (i < 0) return null // overflow
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (digit < t) done = true
        else {
          w *= Base - t
          if (w < 0) return null
          k += Base
        }
      }
      bias = adapt(i - oldi, out.size + 1, oldi == 0)
      n += i / (out.size + 1)
      if (n < 0 || n > 0x10FFFF) return null
      i %= out.size + 1
      out.add(i, n)
      i += 1
    }
    val sb = new java.lang.StringBuilder
    out.forEach(cp => { sb.appendCodePoint(cp); () })
    sb.toString
  }

  private def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var j = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Host → registry (ASCII/Punycode) form, label by label. */
  def toAsciiHost(host: String): String =
    host.toLowerCase(java.util.Locale.ROOT).split("\\.", -1).map { label =>
      if (label.forall(_ < 128)) label
      else "xn--" + punycodeEncode(codePoints(label))
    }.mkString(".")

  /** Host → display (Unicode) form; malformed xn-- labels stay as-is. */
  def toUnicodeHost(host: String): String =
    host.toLowerCase(java.util.Locale.ROOT).split("\\.", -1).map { label =>
      if (label.startsWith("xn--")) {
        val dec = punycodeDecode(label.substring(4))
        if (dec == null) label else dec
      } else label
    }.mkString(".")
}
