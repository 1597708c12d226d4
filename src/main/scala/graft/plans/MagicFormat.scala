package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Magic-number format sniffing — the FIRST routing decision an
  * ingestion pipeline makes on an opaque blob (crawl payloads arrive
  * with wrong/missing Content-Type constantly; bytes don't lie):
  * `magic_format(blob)` → one of png/gif/jpeg/pdf/gzip/zstd/zip/wav/avi/
  * mp4/warc/xml/text-bom/unknown, by the published signatures
  * (RIFF discriminates wav vs avi at offset 8; mp4 matches `ftyp` at
  * offset 4 regardless of the size field; WARC by its version line).
  * Per-row, shuffle-free, codegen — cheap enough to run on 100 TB
  * before any decoder is chosen.
  */
case class MagicFormat(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"magic_format requires binary, got $t")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "magic_format"

  override def nullSafeEval(input: Any): Any =
    MagicFormat.sniff(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MagicFormat.sniff($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MagicFormat {

  private def at(b: Array[Byte], p: Int, s: String): Boolean = {
    if (p + s.length > b.length) return false
    var i = 0
    while (i < s.length) { if ((b(p + i) & 0xff) != s.charAt(i)) return false; i += 1 }
    true
  }
  private def at(b: Array[Byte], p: Int, sig: Array[Int]): Boolean = {
    if (p + sig.length > b.length) return false
    var i = 0
    while (i < sig.length) { if ((b(p + i) & 0xff) != sig(i)) return false; i += 1 }
    true
  }

  /** Static so generated code calls it directly. */
  def sniff(b: Array[Byte]): UTF8String = UTF8String.fromString(
    // 2 = the shortest signature (gzip); each at() bounds-checks, so a
    // 3-byte torn JPEG head or a BOM-only file still routes correctly
    if (b == null || b.length < 2) "unknown"
    else if (at(b, 0, Array(0x89, 0x50, 0x4e, 0x47))) "png"
    else if (at(b, 0, "GIF8")) "gif"
    else if (at(b, 0, Array(0xff, 0xd8, 0xff))) "jpeg"
    else if (at(b, 0, "%PDF")) "pdf"
    else if (at(b, 0, Array(0x1f, 0x8b))) "gzip"
    else if (at(b, 0, Array(0x28, 0xb5, 0x2f, 0xfd)) ||
      (b.length >= 4 && (b(0) & 0xf0) == 0x50 &&
        at(b, 1, Array(0x2a, 0x4d, 0x18)))) "zstd" // frame or skippable
    else if (at(b, 0, Array(0x50, 0x4b, 0x03, 0x04))) "zip"
    else if (at(b, 0, "RIFF") && at(b, 8, "WAVE")) "wav"
    else if (at(b, 0, "RIFF") && at(b, 8, "AVI ")) "avi"
    else if (at(b, 4, "ftyp")) "mp4"
    else if (at(b, 0, "WARC/")) "warc"
    else if (at(b, 0, "<?xml")) "xml"
    else if (at(b, 0, Array(0xef, 0xbb, 0xbf))) "text-bom"
    else "unknown")
}
