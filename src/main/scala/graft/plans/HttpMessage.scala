package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HTTP/1.x message split — the step between a WARC `response` record's
  * payload and the HTML it carries. A crawl response payload is
  * `HTTP/1.x <status> <reason>CRLF` + header lines + blank line + body,
  * where the body is frequently `Transfer-Encoding: chunked` (hex-sized
  * chunks, each CRLF-terminated, a zero chunk then optional trailers
  * ending it) and the charset rides in the `Content-Type` parameters.
  * Without this split the WARC walk ([[WarcRecords]]) stops one layer
  * short of the page text. Reference scope: the reference repo has no
  * crawl ingestion at all — this is north-star LLM-pipeline surface
  * (CommonCrawl WARCs per ISO 28500 store exactly these messages).
  *
  * `http_message(payload)` → struct:
  *   - `status`       INT    — from the status line (null → not HTTP)
  *   - `content_type` STRING — lowercased media type, parameters stripped
  *   - `charset`      STRING — lowercased `charset=` parameter, or null
  *   - `content_encoding` STRING — lowercased coding, or null; gzip and
  *                    deflate (zlib-wrapped with the bare-stream
  *                    fallback) are DECODED under the transfer coding,
  *                    bomb-capped, raw bytes kept on failure
  *   - `n_headers`    INT    — header-field count (obs-folds merged)
  *   - `headers`      ARRAY<STRING> — `name: value`, names lowercased,
  *                    original order (deterministic, oracle-friendly)
  *   - `body`         STRING — after chunked decode, content decoding,
  *                    and charset decode
  *   - `charset_source` STRING — which layer supplied the charset:
  *                    'bom' (WHATWG HTML §13.2.3.1: a UTF-8 /
  *                    UTF-16LE / UTF-16BE byte-order mark on the
  *                    payload bytes outranks EVERYTHING, including a
  *                    contradicting Content-Type charset param, and
  *                    is stripped from the decoded body), 'header'
  *                    (Content-Type param), 'meta' (HTML5 §13.2.3.2
  *                    prescan of the first 1024 body bytes for
  *                    `<meta charset=…>` / the http-equiv form,
  *                    consulted only when BOM and header are both
  *                    silent and the media type is HTML/XML-ish), or
  *                    null (UTF-8 fallback)
  *
  * Byte-level discipline: chunk sizes count BYTES, so decode reassembles
  * the raw byte stream FIRST and only then decodes characters — a chunk
  * boundary may fall mid-multibyte-sequence and a charset-naive split
  * corrupts exactly those pages. Accepts STRING (WARC-walk output; the
  * UTF8String's bytes are the wire bytes) or BINARY (raw fetch body,
  * enabling non-UTF-8 charsets). Unknown/unsupported charsets fall back
  * to UTF-8; `Content-Length` longer than the remaining bytes yields the
  * truncated tail (a real shard's last record is read, not discarded).
  * Per-row, shuffle-free, codegen via a static call.
  */
case class HttpMessage(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"http_message requires string or binary, got $t")
    }

  override def dataType: DataType = HttpMessage.Schema
  override def prettyName: String = "http_message"

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => HttpMessage.parse(s.getBytes)
    case b: Array[Byte] => HttpMessage.parse(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"graft.plans.HttpMessage.parse($c.getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.plans.HttpMessage.parse($c)")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HttpMessage {

  val Schema: StructType = new StructType()
    .add("status", IntegerType)
    .add("content_type", StringType)
    .add("charset", StringType)
    .add("content_encoding", StringType)
    .add("n_headers", IntegerType)
    .add("headers", ArrayType(StringType, containsNull = false))
    .add("body", StringType)
    .add("charset_source", StringType)

  private def nulls(): GenericInternalRow = {
    val r = new GenericInternalRow(8)
    var i = 0; while (i < 8) { r.setNullAt(i); i += 1 }
    r
  }

  private def lineEnd(b: Array[Byte], from: Int, to: Int): Int = {
    var i = from
    while (i + 1 < to) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** Static so generated code calls it directly. Never null, never throws. */
  def parse(b: Array[Byte]): GenericInternalRow = {
    try parseOrThrow(b)
    catch { case scala.util.control.NonFatal(_) => nulls() }
  }

  private def parseOrThrow(b: Array[Byte]): GenericInternalRow = {
    val n = b.length
    // status line: HTTP/1.x SP status [SP reason] CRLF
    if (n < 12 || b(0) != 'H' || b(1) != 'T' || b(2) != 'T' || b(3) != 'P' || b(4) != '/')
      return nulls()
    val sl = lineEnd(b, 0, n)
    if (sl < 0) return nulls()
    var p = 5
    while (p < sl && b(p) != ' ') p += 1 // skip version
    while (p < sl && b(p) == ' ') p += 1
    var status = 0
    var digits = 0
    while (p < sl && b(p) >= '0' && b(p) <= '9' && digits < 3) {
      status = status * 10 + (b(p) - '0'); p += 1; digits += 1
    }
    // exactly 3 digits, terminated by the reason separator or line end —
    // 'HTTP/1.1 2000' must NOT classify as a valid 200
    if (digits != 3 || (p < sl && b(p) != ' ')) return nulls()
    p = sl + 2

    // header block (obs-fold continuations merge into the previous field)
    val names = new scala.collection.mutable.ArrayBuffer[String](8)
    val values = new scala.collection.mutable.ArrayBuffer[String](8)
    var bodyStart = -1
    while (bodyStart < 0) {
      val q = lineEnd(b, p, n)
      if (q < 0) { bodyStart = n } // headers ran to EOF: empty body
      else if (q == p) { bodyStart = q + 2 } // blank line
      else if ((b(p) == ' ' || b(p) == '\t') && names.nonEmpty) {
        // obs-fold: continuation of the previous header value
        val cont = new String(b, p, q - p, Utf8).trim
        values(values.length - 1) = values.last + " " + cont
        p = q + 2
      } else {
        var colon = p
        while (colon < q && b(colon) != ':') colon += 1
        if (colon < q) {
          names += new String(b, p, colon - p, Ascii).trim.toLowerCase(java.util.Locale.ROOT)
          values += new String(b, colon + 1, q - colon - 1, Utf8).trim
        } // malformed header line (no colon): skipped
        p = q + 2
      }
    }

    // routing headers (first occurrence wins, per field-order semantics)
    var contentTypeRaw: String = null
    var transferEncoding: String = null
    var contentEncoding: String = null
    var contentLength = -1L
    var i = 0
    while (i < names.length) {
      names(i) match {
        case "content-type" if contentTypeRaw == null => contentTypeRaw = values(i)
        case "transfer-encoding" if transferEncoding == null => transferEncoding = values(i)
        case "content-encoding" if contentEncoding == null =>
          contentEncoding = values(i).trim.toLowerCase(java.util.Locale.ROOT)
        case "content-length" if contentLength < 0 =>
          contentLength = try values(i).toLong catch { case _: NumberFormatException => -1L }
        case _ =>
      }
      i += 1
    }

    // chunked wins over Content-Length (RFC 9112 §6.3); "chunked" must be
    // the FINAL coding in the list for the framing to be chunk-based.
    // A TE list WITHOUT final chunked means the body runs to EOF (the
    // RFC says ignore Content-Length then) and the codings still apply.
    val teCodings: Array[String] =
      if (transferEncoding == null) Array.empty
      else transferEncoding.toLowerCase(java.util.Locale.ROOT).split(',').map(_.trim)
    val chunked = teCodings.nonEmpty && teCodings.last == "chunked"

    val framedRaw: Array[Byte] =
      if (chunked) decodeChunked(b, bodyStart, n)
      else if (teCodings.nonEmpty) java.util.Arrays.copyOfRange(b, bodyStart, n)
      else if (contentLength >= 0) {
        val take = math.min(contentLength, (n - bodyStart).toLong).toInt
        java.util.Arrays.copyOfRange(b, bodyStart, bodyStart + take)
      } else java.util.Arrays.copyOfRange(b, bodyStart, n)

    // undo the REMAINING transfer codings, outermost (last listed) first
    // — e.g. 'Transfer-Encoding: gzip, chunked' is gzip INSIDE chunked
    val framedBytes: Array[Byte] = {
      var cur = framedRaw
      val rest = if (chunked) teCodings.dropRight(1) else teCodings
      var i = rest.length - 1
      var stop = false
      while (i >= 0 && !stop) {
        rest(i) match {
          case "gzip" | "x-gzip" => cur = gunzipOr(cur, cur)
          case "deflate" => cur = inflateOr(cur, cur)
          case "identity" | "" => // no-op
          case _ => stop = true // unknown coding: keep what we have
        }
        i -= 1
      }
      cur
    }

    // content coding UNDER the transfer coding (RFC 9110 §8.4): the
    // chunked layer frames the wire, Content-Encoding compresses the
    // representation inside it. Undecodable/unknown codings keep the
    // raw bytes (crawl tolerance — the field still reports the coding).
    val bodyBytes: Array[Byte] = contentEncoding match {
      case null | "identity" => framedBytes
      case enc =>
        // walk the coding LIST outermost (last listed) first, mirroring
        // the transfer-coding loop above — 'gzip, gzip' or 'deflate, gzip'
        // must undo every layer, not just the outermost; stop at the
        // first unknown coding (crawl tolerance: keep what we have)
        val codings = enc.split(',')
        var cur = framedBytes
        var ci = codings.length - 1
        var stop = false
        while (ci >= 0 && !stop) {
          codings(ci).trim match {
            case "gzip" | "x-gzip" => cur = gunzipOr(cur, cur)
            case "deflate" => cur = inflateOr(cur, cur)
            case "identity" | "" => // no-op
            case _ => stop = true
          }
          ci -= 1
        }
        cur
    }

    // content-type split + charset param
    var mediaType: String = null
    var charset: String = null
    if (contentTypeRaw != null) {
      val semi = contentTypeRaw.indexOf(';')
      mediaType = (if (semi < 0) contentTypeRaw else contentTypeRaw.substring(0, semi))
        .trim.toLowerCase(java.util.Locale.ROOT)
      if (semi >= 0) {
        contentTypeRaw.substring(semi + 1).split(';').foreach { param =>
          val eq = param.indexOf('=')
          if (eq > 0 && param.substring(0, eq).trim.equalsIgnoreCase("charset") && charset == null) {
            var v = param.substring(eq + 1).trim
            if (v.length >= 2 && v.head == '"' && v.last == '"') v = v.substring(1, v.length - 1)
            if (v.nonEmpty) charset = v.toLowerCase(java.util.Locale.ROOT)
          }
        }
      }
    }

    // Charset precedence, WHATWG HTML §13.2.3 order:
    //   1. BOM (§13.2.3.1) — a byte-order mark on the decoded payload
    //      bytes wins over every declaration, header included (BOM'd
    //      UTF-8 contradicting an iso-8859-1 header is common, and a
    //      UTF-16 page is pure mojibake under any byte-level fallback).
    //   2. transport header (Content-Type charset param).
    //   3. HTML5 meta prescan (§13.2.3.2, simplified): when BOM and
    //      header are both silent and the payload is HTML-ish, scan the
    //      first 1024 BYTES (ASCII-superset read — the prescan runs
    //      before any real decode can) for `<meta charset=X>` or the
    //      http-equiv `content="...; charset=X"` form.
    // `charset_source` records which layer won:
    // 'bom' | 'header' | 'meta' | null (UTF-8 fallback).
    var charsetSource: String = null
    val bomCharset = sniffBom(bodyBytes)
    if (bomCharset != null) { charset = bomCharset; charsetSource = "bom" }
    else if (charset != null) charsetSource = "header"
    else if (mediaType == null || mediaType.contains("html")
      || mediaType.contains("xml")) {
      val sniffed = sniffMetaCharset(bodyBytes)
      if (sniffed != null) { charset = sniffed; charsetSource = "meta" }
    }

    // charset routing: decode the reassembled BYTES with the winning
    // charset; unknown/unsupported → UTF-8 (the crawl-tolerant
    // default). A BOM is an encoding signature, not content — it is
    // stripped before decode (the UTF-16 decoders get explicit-endian
    // charsets so the mark is never re-interpreted as text).
    val body: UTF8String =
      if (charsetSource == "bom") charset match {
        case "utf-8" =>
          UTF8String.fromBytes(bodyBytes, 3, bodyBytes.length - 3)
        case "utf-16le" =>
          UTF8String.fromString(
            new String(bodyBytes, 2, bodyBytes.length - 2,
              java.nio.charset.StandardCharsets.UTF_16LE))
        case _ =>
          UTF8String.fromString(
            new String(bodyBytes, 2, bodyBytes.length - 2,
              java.nio.charset.StandardCharsets.UTF_16BE))
      }
      else if (charset == null || charset == "utf-8" || charset == "utf8")
        UTF8String.fromBytes(bodyBytes)
      else {
        val cs =
          try java.nio.charset.Charset.forName(charset)
          catch { case scala.util.control.NonFatal(_) => Utf8 }
        UTF8String.fromString(new String(bodyBytes, cs))
      }

    val headerStrs = new Array[Any](names.length)
    i = 0
    while (i < names.length) {
      headerStrs(i) = UTF8String.fromString(names(i) + ": " + values(i))
      i += 1
    }

    val r = new GenericInternalRow(8)
    r.setInt(0, status)
    if (mediaType != null) r.update(1, UTF8String.fromString(mediaType)) else r.setNullAt(1)
    if (charset != null) r.update(2, UTF8String.fromString(charset)) else r.setNullAt(2)
    if (contentEncoding != null) r.update(3, UTF8String.fromString(contentEncoding))
    else r.setNullAt(3)
    r.setInt(4, names.length)
    r.update(5, new GenericArrayData(headerStrs))
    r.update(6, body)
    if (charsetSource != null) r.update(7, UTF8String.fromString(charsetSource))
    else r.setNullAt(7)
    r
  }

  /** WHATWG §13.2.3.1 BOM sniff: 'utf-8' (EF BB BF), 'utf-16be'
    * (FE FF), 'utf-16le' (FF FE), or null. UTF-16 checked by its
    * 2-byte signature exactly as the spec orders it — a UTF-32LE
    * FF FE 00 00 intentionally reads as UTF-16LE (the spec's own
    * table stops at UTF-16).
    */
  def sniffBom(b: Array[Byte]): String =
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
      b(2) == 0xBF.toByte) "utf-8"
    else if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte) "utf-16be"
    else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte) "utf-16le"
    else null

  /** The prescan window the WHATWG algorithm mandates. */
  val MetaPrescanBytes = 1024

  private val MetaCharsetRe = java.util.regex.Pattern.compile(
    "<meta[^>]*?charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9_.:+-]+)",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  /** `<meta charset=...>` / http-equiv prescan over the first
    * [[MetaPrescanBytes]] bytes: ISO-8859-1 read (byte-transparent —
    * charset NAMES are ASCII and the real decode hasn't happened yet),
    * first match wins, lowercased; null when absent.
    */
  def sniffMetaCharset(b: Array[Byte]): String = {
    val n = math.min(b.length, MetaPrescanBytes)
    if (n == 0) return null
    val prefix = new String(b, 0, n, java.nio.charset.StandardCharsets.ISO_8859_1)
    val m = MetaCharsetRe.matcher(prefix)
    if (m.find()) m.group(1).toLowerCase(java.util.Locale.ROOT) else null
  }

  /** Capped gzip decode (multi-member per GZIPInputStream); `orElse`
    * on malformed/bombed input.
    */
  private def gunzipOr(b: Array[Byte], orElse: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b), 8192)
      val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 4))
      val buf = new Array[Byte](8192)
      var total = 0
      var n = in.read(buf)
      while (n >= 0) {
        total += n
        if (total > GunzipText.MaxOutputBytes) return orElse // bomb cap
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } catch { case scala.util.control.NonFatal(_) => orElse }

  /** HTTP "deflate": zlib-wrapped per the RFC, raw-deflate fallback for
    * the servers that (infamously) send it bare. Capped; `orElse` on
    * failure.
    */
  private def inflateOr(b: Array[Byte], orElse: Array[Byte]): Array[Byte] = {
    def run(raw: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(raw)
      try {
        inf.setInput(b)
        val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 4))
        val buf = new Array[Byte](8192)
        var total = 0
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return null
          total += n
          if (total > GunzipText.MaxOutputBytes) return null // bomb cap
          out.write(buf, 0, n)
        }
        out.toByteArray
      } catch { case scala.util.control.NonFatal(_) => null } finally inf.end()
    }
    val zlib = run(raw = false)
    if (zlib != null) zlib
    else {
      val bare = run(raw = true)
      if (bare != null) bare else orElse
    }
  }

  /** RFC 9112 §7.1 chunked decode over raw bytes: `hex-size[;ext]CRLF
    * data CRLF` repeated, `0`-size chunk then trailer lines to a blank
    * line. Tolerant of truncation: returns everything decoded before the
    * damage (crawl shards end mid-fetch constantly).
    */
  private def decodeChunked(b: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(to - from, 1 << 16))
    var p = from
    var done = false
    while (!done) {
      val q = lineEnd(b, p, to)
      if (q < 0) done = true
      else {
        // hex size, stopping at ';' (chunk extensions) or whitespace
        var size = 0L
        var i = p
        var any = false
        var bad = false
        while (i < q && !bad) {
          val c = b(i)
          val d =
            if (c >= '0' && c <= '9') c - '0'
            else if (c >= 'a' && c <= 'f') c - 'a' + 10
            else if (c >= 'A' && c <= 'F') c - 'A' + 10
            else -1
          if (d < 0) {
            if (c == ';' || c == ' ' || c == '\t') i = q // extension/ows: stop
            else bad = true
          } else {
            size = size * 16 + d; any = true; i += 1
            if (size > Int.MaxValue) bad = true
          }
        }
        if (bad || !any) done = true
        else if (size == 0L) done = true // trailers (if any) are not body
        else {
          p = q + 2
          val take = math.min(size, (to - p).toLong).toInt
          if (take > 0) out.write(b, p, take)
          if (take < size) done = true // truncated final chunk
          else p += take + 2 // skip chunk-data CRLF
        }
      }
    }
    out.toByteArray
  }
}

/** Fixture-side chunked-transfer encoder: re-frames a string's BYTES as
  * `Transfer-Encoding: chunked` data with fixed `chunkSize`-byte chunks
  * (so chunk boundaries straddle multibyte characters on purpose —
  * the case the decoder must reassemble before charset decode).
  * Plant-only, the same idiom as [[GzipBytes]]/[[JpegPlant]].
  */
case class HttpChunkedPlant(child: Expression, chunkSize: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"http_chunked requires string, got $t")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "http_chunked"

  override def nullSafeEval(input: Any): Any =
    HttpChunkedPlant.encode(input.asInstanceOf[UTF8String], chunkSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HttpChunkedPlant.encode($c, $chunkSize)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HttpChunkedPlant {
  def encode(s: UTF8String, chunkSize: Int): UTF8String = {
    val b = s.getBytes
    val out = new java.io.ByteArrayOutputStream(b.length + 16 * (b.length / math.max(1, chunkSize) + 2))
    var p = 0
    while (p < b.length) {
      val take = math.min(chunkSize, b.length - p)
      out.write(java.lang.Integer.toHexString(take).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      out.write('\r'); out.write('\n')
      out.write(b, p, take)
      out.write('\r'); out.write('\n')
      p += take
    }
    out.write('0'.toInt); out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    UTF8String.fromBytes(out.toByteArray)
  }
}
