package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `fix_mojibake(text)` — undo UTF-8 bytes mis-decoded as Latin-1 or
  * Windows-1252 (the ftfy core repair, the single most common text
  * corruption in crawled corpora: "café" shipped as "cafÃ©",
  * smart quotes as "â€™", CJK as "æ—¥æœ¬", and the DOUBLE-decoded
  * forms a second broken hop produces). The repair is the exact
  * inverse when one exists:
  *
  *   1. map every char back to the byte it came from — identity for
  *      code points < 0x100 (the Latin-1 decode), the 27 published
  *      Windows-1252 specials (€ ‚ ƒ … ™ œ …) back to 0x80–0x9F; any
  *      other char means the string never came from a single-byte
  *      decode → STOP, return as-is;
  *   2. if the recovered bytes are STRICTLY valid UTF-8 and contain at
  *      least one multi-byte sequence, decode them and repeat (up to
  *      [[FixMojibake.MaxRounds]] hops — double mojibake is real,
  *      triple is the declared ceiling);
  *   3. otherwise the text was genuine extended-Latin all along
  *      ("Grüße" reverses to invalid UTF-8) → return unchanged.
  *
  * Declared tradeoff (ftfy's own): a genuine text that happens to
  * reverse into valid multi-byte UTF-8 is "repaired" — such strings
  * are vanishingly rare in natural text because UTF-8 continuation
  * constraints are strict. No heuristics, no scoring: the transform
  * is deterministic, idempotent on its own output, and exactly
  * invertible where applied. Idempotence holds unconditionally: the
  * repair loops to a FIXPOINT, and an input still repairable after
  * [[FixMojibake.MaxRounds]] hops (pathological ≥4-deep nesting)
  * returns the ORIGINAL string untouched rather than a partially
  * unwound one — fix(fix(x)) = fix(x) on every input, not just ≤3-hop
  * ones. Per-row, shuffle-free, codegen via a static call.
  */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"fix_mojibake requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(FixMojibake.fix(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.FixMojibake.fix($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FixMojibake {

  /** Double mojibake happens (two broken hops); triple is the ceiling. */
  val MaxRounds = 3

  /** Windows-1252 0x80–0x9F: code point → original byte. The five
    * undefined slots (0x81 0x8D 0x8F 0x90 0x9D) decode as U+0081 …
    * and reverse through the identity path below.
    */
  private val Cp1252: Map[Int, Int] = Map(
    0x20AC -> 0x80, 0x201A -> 0x82, 0x0192 -> 0x83, 0x201E -> 0x84,
    0x2026 -> 0x85, 0x2020 -> 0x86, 0x2021 -> 0x87, 0x02C6 -> 0x88,
    0x2030 -> 0x89, 0x0160 -> 0x8A, 0x2039 -> 0x8B, 0x0152 -> 0x8C,
    0x017D -> 0x8E, 0x2018 -> 0x91, 0x2019 -> 0x92, 0x201C -> 0x93,
    0x201D -> 0x94, 0x2022 -> 0x95, 0x2013 -> 0x96, 0x2014 -> 0x97,
    0x02DC -> 0x98, 0x2122 -> 0x99, 0x0161 -> 0x9A, 0x203A -> 0x9B,
    0x0153 -> 0x9C, 0x017E -> 0x9E, 0x0178 -> 0x9F)

  /** The byte string `s` came from under a Latin-1/cp1252 decode, or
    * null when some char has no single-byte origin.
    */
  private def reverseBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      if (c < 0x100) out(i) = c.toByte
      else Cp1252.get(c) match {
        case Some(b) => out(i) = b.toByte
        case None => return null
      }
      i += 1
    }
    out
  }

  /** Strict UTF-8 decode; null unless valid AND ≥1 multi-byte
    * sequence (an all-ASCII reversal is the identity — not a repair).
    */
  private def strictUtf8(b: Array[Byte]): String = {
    var hasMulti = false
    var i = 0
    while (i < b.length && !hasMulti) { if ((b(i) & 0x80) != 0) hasMulti = true; i += 1 }
    if (!hasMulti) return null
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** Static so generated code calls it directly. Never null, never
    * throws; returns the input when no exact repair applies, and the
    * ORIGINAL input when [[MaxRounds]] hops still haven't reached a
    * fixpoint (returning the partial unwind would break idempotence:
    * fix() on that output would make further progress).
    */
  def fix(s: String): String = {
    var cur = s
    var round = 0
    while (round < MaxRounds) {
      val rb = reverseBytes(cur)
      if (rb == null) return cur
      val dec = strictUtf8(rb)
      if (dec == null || dec == cur) return cur
      cur = dec
      round += 1
    }
    // cap reached: if another hop would still progress, the input is
    // deeper than the declared ceiling — leave it alone entirely
    val rb = reverseBytes(cur)
    if (rb != null && { val d = strictUtf8(rb); d != null && d != cur }) s
    else cur
  }
}
