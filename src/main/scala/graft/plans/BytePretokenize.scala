package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `byte_pretokenize(text)` — the GPT-2 byte-level tokenizer FRONT
  * END (Radford et al. 2019; the pretokenizer every byte-level BPE
  * vocabulary since has reused): split text with the published
  * pattern
  *
  *   `'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|
  *    \s+(?!\S)|\s+`
  *
  * (contractions split off, a single leading space attaches to the
  * following word/number/punct run, interior whitespace runs keep
  * their LAST space for the next token via the lookahead, trailing
  * whitespace stands alone), then map each pretoken's UTF-8 BYTES
  * through the GPT-2 byte→unicode table — printable bytes (33–126,
  * 161–172, 174–255) are themselves; the 68 others (controls, space,
  * DEL, NBSP range, soft hyphen) shift to 256+rank so every token is
  * losslessly printable (space → Ġ U+0120, newline → Ċ U+010A). The
  * BPE merge walk (X45/X77) runs WITHIN these pretokens; this
  * expression is the seam in front of it.
  *
  * Output: array<string> of byte-mapped pretokens, concat-losslessly
  * invertible ([[BytePretokenize.decode]] — spec-pinned round trip).
  * Per-row, shuffle-free, static-call codegen.
  */
case class BytePretokenize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"byte_pretokenize requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "byte_pretokenize"
  override def nullSafeEval(input: Any): Any =
    BytePretokenize.split(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BytePretokenize.split($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BytePretokenize {

  /** The published GPT-2 pattern, verbatim. */
  val Pattern: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

  /** byte → unicode code point: printables map to themselves, the 68
    * excluded bytes to 256 + rank (GPT-2's bytes_to_unicode).
    */
  val ByteToUni: Array[Char] = {
    val out = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      val printable = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174)
      if (printable) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  private val UniToByte: Map[Char, Int] =
    ByteToUni.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** One pretoken's bytes through the map. */
  def encodeToken(tok: String): String = {
    val bytes = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(ByteToUni(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Inverse of [[encodeToken]] — the losslessness witness. */
  def decode(mapped: String): String = {
    val bytes = new Array[Byte](mapped.length)
    var i = 0
    while (i < mapped.length) {
      bytes(i) = UniToByte(mapped.charAt(i)).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Static so generated code calls it directly. */
  def split(text: String): ArrayData = {
    val m = Pattern.matcher(text)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](16)
    while (m.find()) out += UTF8String.fromString(encodeToken(m.group()))
    new GenericArrayData(out.toArray[Any])
  }
}
