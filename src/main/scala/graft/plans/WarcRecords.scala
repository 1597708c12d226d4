package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500) record walk — the container format of CommonCrawl,
  * the largest public LLM-corpus source. A WARC file is a sequence of
  * records: a `WARC/1.0` version line, CRLF header lines
  * (`Name: value`), a blank line, then EXACTLY `Content-Length` bytes
  * of payload, then CRLF CRLF. Splitting on anything but the declared
  * length is wrong the moment a payload contains header-looking text —
  * the framing IS the format, so the parser must walk it.
  *
  * `warc_records(blob)` → array of (rec_type, uri, content_length,
  * payload) structs: one scan, headers matched case-insensitively
  * (the spec allows any case), unknown headers skipped, records
  * without a parsable Content-Length or truncated payloads end the
  * walk cleanly (records before the damage still return — a real
  * crawl shard is read to the last whole record, not discarded).
  *
  * Byte-level framing: Content-Length counts BYTES; offsets here are
  * maintained over the raw bytes and payload slices decode as UTF-8,
  * exactly how a WARC reader must treat multibyte pages. Per-row,
  * shuffle-free, whole-stage codegen.
  */
case class WarcRecords(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"warc_records requires string, got $t")
    }

  override def dataType: DataType = ArrayType(WarcRecords.RecordSchema, containsNull = false)
  override def prettyName: String = "warc_records"

  override def nullSafeEval(input: Any): Any =
    WarcRecords.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WarcRecords.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WarcRecords {

  val RecordSchema: StructType = new StructType()
    .add("rec_type", StringType)
    .add("uri", StringType)
    .add("content_length", LongType)
    .add("payload", StringType)

  private val Version = "WARC/1.0".getBytes

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  private def startsWithAt(b: Array[Byte], p: Int, s: Array[Byte]): Boolean = {
    if (p + s.length > b.length) return false
    var i = 0
    while (i < s.length) { if (b(p + i) != s(i)) return false; i += 1 }
    true
  }

  private def headerName(b: Array[Byte], from: Int, colon: Int): String = {
    val s = new String(b, from, colon - from, java.nio.charset.StandardCharsets.US_ASCII)
    s.trim.toLowerCase(java.util.Locale.ROOT)
  }

  /** Static so generated code calls it directly. Never null, never throws. */
  def parse(blob: UTF8String): GenericArrayData = {
    val b = blob.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[GenericInternalRow](4)
    var p = 0
    var ok = true
    while (ok && p < b.length) {
      // skip inter-record CRLFs
      while (p + 1 < b.length && b(p) == '\r' && b(p + 1) == '\n') p += 2
      if (p >= b.length) ok = false
      else if (!startsWithAt(b, p, Version)) ok = false
      else {
        var q = lineEnd(b, p)
        if (q < 0) ok = false
        else {
          p = q + 2
          var recType: String = null
          var uri: String = null
          var len = -1L
          // header lines until the blank CRLF line
          var inHeaders = true
          while (inHeaders && ok) {
            q = lineEnd(b, p)
            if (q < 0) ok = false
            else if (q == p) { inHeaders = false; p = q + 2 } // blank line
            else {
              var colon = p
              while (colon < q && b(colon) != ':') colon += 1
              if (colon < q) {
                val name = headerName(b, p, colon)
                val value = new String(b, colon + 1, q - colon - 1,
                  java.nio.charset.StandardCharsets.UTF_8).trim
                name match {
                  case "warc-type" => recType = value
                  case "warc-target-uri" => uri = value
                  case "content-length" =>
                    len = try value.toLong catch { case _: NumberFormatException => -1L }
                  case _ => // skip unknown headers
                }
              }
              p = q + 2
            }
          }
          if (ok) {
            if (len < 0 || p + len > b.length) ok = false // unframed/truncated
            else {
              val payload = UTF8String.fromBytes(b, p, len.toInt)
              val r = new GenericInternalRow(4)
              if (recType != null) r.update(0, UTF8String.fromString(recType)) else r.setNullAt(0)
              if (uri != null) r.update(1, UTF8String.fromString(uri)) else r.setNullAt(1)
              r.setLong(2, len)
              r.update(3, payload)
              out += r
              p += len.toInt
            }
          }
        }
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}
