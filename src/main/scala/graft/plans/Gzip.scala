package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** gzip member compression/decompression for crawl-shard shapes —
  * CommonCrawl ships `.warc.gz` with EACH record a separate gzip
  * member, concatenated; a reader that stops at the first member
  * silently drops the shard's tail. [[GunzipText]] therefore decodes
  * ALL members (JDK `GZIPInputStream` multi-member mode) and returns
  * the concatenated text; malformed/truncated input yields null, and a
  * 64 MiB output cap guards against decompression bombs (a real
  * ingestion concern — a 4 KB bomb can expand to GBs and take the
  * executor down; capped rows return null and are countable).
  *
  * [[GzipBytes]] is the planting twin (JDK `GZIPOutputStream`, one
  * member per call) — gates compose it to build genuine multi-member
  * blobs whose DECODED content the DuckDB oracle restates; compressed
  * bytes themselves are never compared (deflate output is
  * implementation-defined; content is the contract, as with
  * [[PngPlant]]).
  */
case class GunzipText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"gunzip_text requires binary, got $t")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "gunzip_text"

  override def nullSafeEval(input: Any): Any =
    GunzipText.gunzip(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("gunzipped")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $r = graft.plans.GunzipText.gunzip($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GunzipText {

  /** Decompression-bomb guard. */
  val MaxOutputBytes: Int = 64 << 20

  /** Static so generated code calls it directly. Null on malformed,
    * truncated, or over-cap input — never a throw.
    */
  def gunzip(b: Array[Byte]): UTF8String =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b), 8192)
      val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 4))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      var total = 0
      var bombed = false
      while (n >= 0 && !bombed) {
        total += n
        if (total > MaxOutputBytes) bombed = true
        else { out.write(buf, 0, n); n = in.read(buf) }
      }
      if (bombed) null else UTF8String.fromBytes(out.toByteArray)
    } catch { case _: Exception => null }
}

/** One gzip member around the UTF-8 bytes of a string — the plant
  * side; see [[GunzipText]].
  */
case class GzipBytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"gzip_bytes requires string, got $t")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip_bytes"

  override def nullSafeEval(input: Any): Any =
    GzipBytes.gzip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GzipBytes.gzip($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GzipBytes {
  def gzip(s: UTF8String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(s.getBytes)
    gz.close()
    out.toByteArray
  }
}
