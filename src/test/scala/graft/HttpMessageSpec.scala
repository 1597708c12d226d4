package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.plans.{HttpChunkedPlant, HttpMessage}
import org.apache.spark.unsafe.types.UTF8String

class HttpMessageSpec extends SparkSuite {

  private def split(msg: Array[Byte]): Row = {
    import spark.implicits._
    Seq(msg).toDF("b")
      .select(org.apache.spark.sql.GraftColumnShim.column(
        HttpMessage(org.apache.spark.sql.GraftColumnShim.expression(col("b")))).as("h"))
      .select("h.*").collect()(0)
  }

  private def splitStr(msg: String): Row = {
    import spark.implicits._
    Seq(msg).toDF("b")
      .select(org.apache.spark.sql.GraftColumnShim.column(
        HttpMessage(org.apache.spark.sql.GraftColumnShim.expression(col("b")))).as("h"))
      .select("h.*").collect()(0)
  }

  test("chunk boundaries straddling multibyte characters reassemble exactly") {
    // é=2 bytes, 語=3 bytes, 🙂=4 bytes; chunk size 3 splits every one of
    // them mid-sequence somewhere — a char-level decoder corrupts this
    val body = "aé語🙂zé語🙂"
    // keep the chunk stream as BYTES: a 3-byte chunk boundary inside é
    // makes the stream invalid UTF-8 mid-chunk, which is the point
    val chunked = HttpChunkedPlant.encode(UTF8String.fromString(body), 3).getBytes
    val head = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val r = split(head ++ chunked)
    assert(r.getAs[Int]("status") == 200)
    assert(r.getAs[String]("body") == body)
    assert(r.getAs[String]("charset") == "utf-8")
  }

  test("every chunk size from 1 to 9 round-trips a multibyte body") {
    val body = "héllo wörld — 三体 🙂🙂 end"
    val head = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    (1 to 9).foreach { k =>
      val chunked = HttpChunkedPlant.encode(UTF8String.fromString(body), k).getBytes
      val r = split(head ++ chunked)
      assert(r.getAs[String]("body") == body, s"chunk size $k")
    }
  }

  test("chunked property: random bodies in random-size chunks round-trip exactly") {
    // test-local encoder with PER-CHUNK random sizes and random
    // extensions — broader than the fixed-size plant the gate uses
    val rnd = new scala.util.Random(7)
    def chunkEncode(body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var p = 0
      while (p < body.length) {
        val take = math.min(1 + rnd.nextInt(11), body.length - p)
        val ext = if (rnd.nextInt(4) == 0) ";x=" + rnd.nextInt(9) else ""
        out.write((Integer.toHexString(take) + ext + "\r\n").getBytes)
        out.write(body, p, take)
        out.write("\r\n".getBytes)
        p += take
      }
      out.write("0\r\n".getBytes)
      if (rnd.nextBoolean()) out.write("X-Trailer: t\r\n".getBytes)
      out.write("\r\n".getBytes)
      out.toByteArray
    }
    val head = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    for (trial <- 1 to 200) {
      // random UTF-8 text incl. multibyte, plus occasional raw bytes
      val body =
        if (trial % 5 == 0) { val b = new Array[Byte](rnd.nextInt(60)); rnd.nextBytes(b); b }
        else (0 until rnd.nextInt(40)).map(_ =>
          "aé語🙂\r\n0".charAt(rnd.nextInt(7))).mkString.getBytes("UTF-8")
      val r = split(head ++ chunkEncode(body))
      val got = r.getAs[String]("body")
      // Row materialization decodes via new String(bytes, UTF_8), so the
      // expected value is the same decode of the original bytes — exact
      // for valid UTF-8, identical replacement behavior for raw bytes
      assert(got == new String(body, "UTF-8"),
        s"trial $trial: ${body.length}B body diverged")
    }
  }

  test("chunked framing wins over a present Content-Length (RFC 9112 §6.3)") {
    val chunked = HttpChunkedPlant.encode(UTF8String.fromString("realbody"), 5).toString
    val r = splitStr(
      "HTTP/1.1 200 OK\r\nContent-Length: 3\r\nTransfer-Encoding: chunked\r\n\r\n" + chunked)
    assert(r.getAs[String]("body") == "realbody")
  }

  test("chunk extensions and trailers are consumed, not leaked into the body") {
    val msg = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4;ext=\"v\"\r\nwiki\r\n5\r\npedia\r\n0\r\nX-Trailer: t\r\n\r\n"
    val r = splitStr(msg)
    assert(r.getAs[String]("body") == "wikipedia")
  }

  test("truncated chunked stream yields the bytes decoded before the damage") {
    val msg = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4\r\nwiki\r\nff\r\nonly-a-little"
    val r = splitStr(msg)
    assert(r.getAs[String]("body") == "wikionly-a-little")
  }

  test("Content-Length longer than the payload returns the truncated tail") {
    val r = splitStr("HTTP/1.1 200 OK\r\nContent-Length: 999\r\n\r\nshort")
    assert(r.getAs[String]("body") == "short")
  }

  test("charset routing: latin-1 bytes decode via the declared charset") {
    // 0xE9 is 'é' in ISO-8859-1 and INVALID as UTF-8 — only the binary
    // path + declared charset can produce the right character
    val head = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val body = Array[Byte]('c', 'a', 'f', 0xE9.toByte)
    val r = split(head ++ body)
    assert(r.getAs[String]("charset") == "iso-8859-1")
    assert(r.getAs[String]("body") == "café")
  }

  test("unknown charset falls back to UTF-8 bytes") {
    val r = splitStr("HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=x-no-such\r\n\r\nok")
    assert(r.getAs[String]("charset") == "x-no-such")
    assert(r.getAs[String]("body") == "ok")
  }

  test("full codec table: windows-1251 and shift_jis bodies decode correctly") {
    // both single-byte-per-char cp1251 Cyrillic and double-byte
    // shift_jis kana are invalid as UTF-8 — routing must reach the
    // JVM's charset registry, not an ISO-8859-1/UTF-8 shortlist
    val ru = "привет" // "privet"
    val head1 = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=windows-1251\r\n\r\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val r1 = split(head1 ++ ru.getBytes("windows-1251"))
    assert(r1.getAs[String]("charset") == "windows-1251")
    assert(r1.getAs[String]("body") == ru)

    val ja = "こんにちは" // "konnichiwa"
    val head2 = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=shift_jis\r\n\r\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val r2 = split(head2 ++ ja.getBytes("shift_jis"))
    assert(r2.getAs[String]("charset") == "shift_jis")
    assert(r2.getAs[String]("body") == ja)

    // IANA alias resolution: csKOI8R names the same codec as KOI8-R
    val head3 = "HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=csKOI8R\r\n\r\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val r3 = split(head3 ++ ru.getBytes("KOI8-R"))
    assert(r3.getAs[String]("body") == ru)
  }

  test("obs-fold continuation lines merge into the previous header") {
    val r = splitStr(
      "HTTP/1.1 200 OK\r\nX-Long: part one\r\n\tpart two\r\nContent-Type: a/b\r\n\r\nx")
    assert(r.getAs[Int]("n_headers") == 2)
    assert(r.getSeq[String](r.fieldIndex("headers")).contains("x-long: part one part two"))
  }

  test("Content-Encoding gzip under Transfer-Encoding chunked: both undone, in order") {
    val body = "the compressed représentation 🙂"
    val gz = graft.plans.GzipBytes.gzip(UTF8String.fromString(body))
    val chunked = HttpChunkedPlant.encode(
      UTF8String.fromBytes(gz), 5).getBytes
    val head = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      "Transfer-Encoding: chunked\r\nContent-Type: text/html; charset=utf-8\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val r = split(head ++ chunked)
    assert(r.getAs[String]("content_encoding") == "gzip")
    assert(r.getAs[String]("body") == body)
  }

  test("deflate: zlib-wrapped and bare streams both decode") {
    val body = "deflated content here"
    def deflate(raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
      d.setInput(body.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](256)
      val n = d.deflate(buf); d.end()
      buf.take(n)
    }
    Seq(false, true).foreach { raw =>
      val msg = "HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ deflate(raw)
      val r = split(msg)
      assert(r.getAs[String]("body") == body, s"raw=$raw")
    }
  }

  test("Transfer-Encoding gzip WITHOUT chunked: body runs to EOF and is decoded") {
    val body = "transfer-coded representation"
    val gz = graft.plans.GzipBytes.gzip(UTF8String.fromString(body))
    val head = "HTTP/1.1 200 OK\r\nContent-Length: 3\r\nTransfer-Encoding: gzip\r\n\r\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    // Content-Length must be IGNORED when TE is present (RFC 9112 §6.3)
    val r = split(head ++ gz)
    assert(r.getAs[String]("body") == body)
  }

  test("stacked transfer codings: 'gzip, chunked' undoes chunked then gzip") {
    val body = "inner payload"
    val gz = graft.plans.GzipBytes.gzip(UTF8String.fromString(body))
    val chunked = HttpChunkedPlant.encode(UTF8String.fromBytes(gz), 4).getBytes
    val head = "HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked\r\n\r\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val r = split(head ++ chunked)
    assert(r.getAs[String]("body") == body)
  }

  test("malformed status digits: 'HTTP/1.1 2000' is not a valid 200") {
    val r = splitStr("HTTP/1.1 2000 OK\r\n\r\nbody")
    assert(r.isNullAt(r.fieldIndex("status")), "4-digit status must yield nulls")
    val ok = splitStr("HTTP/1.1 204\r\n\r\n")
    assert(ok.getAs[Int]("status") == 204, "bare 3-digit status without reason is fine")
  }

  test("undecodable or unknown content codings keep the raw bytes") {
    val r = splitStr("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot actually gzip")
    assert(r.getAs[String]("content_encoding") == "gzip")
    assert(r.getAs[String]("body") == "not actually gzip")
    val r2 = splitStr("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nbrotli-we-dont-do")
    assert(r2.getAs[String]("body") == "brotli-we-dont-do")
  }

  test("non-HTTP payloads yield in-struct nulls, never a throw") {
    Seq("not http at all", "HTTP/1.1 weird\r\n\r\n", "").foreach { s =>
      val r = splitStr(s)
      assert(r.isNullAt(r.fieldIndex("status")), s"for input '$s'")
    }
  }

  test("status/reason parse without headers or body") {
    val r = splitStr("HTTP/1.1 304 Not Modified\r\n\r\n")
    assert(r.getAs[Int]("status") == 304)
    assert(r.getAs[Int]("n_headers") == 0)
    assert(r.getAs[String]("body") == "")
    assert(r.isNullAt(r.fieldIndex("content_type")))
  }

  test("header block running to EOF (no blank line) means empty body") {
    val r = splitStr("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n")
    assert(r.getAs[Int]("status") == 200)
    assert(r.getAs[String]("body") == "")
  }

  test("meta prescan: header-silent HTML routes through <meta charset>") {
    val body = "<html><head><meta charset=\"windows-1251\"></head><body>"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      "привет".getBytes("windows-1251") ++ "</body>".getBytes
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes
    val r = split(head ++ body)
    assert(r.getAs[String]("charset") == "windows-1251")
    assert(r.getAs[String]("charset_source") == "meta")
    assert(r.getAs[String]("body").contains("привет"))
  }

  test("meta prescan: http-equiv form, single quotes, unquoted values all match") {
    def charsetOf(meta: String): String = HttpMessage.sniffMetaCharset(
      s"<html><head>$meta</head><body>x</body>".getBytes)
    assert(charsetOf("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=shift_jis\">") == "shift_jis")
    assert(charsetOf("<meta charset='ISO-8859-1'>") == "iso-8859-1")
    assert(charsetOf("<meta charset=utf-8>") == "utf-8")
    assert(charsetOf("<meta name=\"viewport\" content=\"width=1\">") == null)
  }

  test("meta prescan: header charset WINS over a conflicting meta (charset_source=header)") {
    val body = "<html><head><meta charset=\"shift_jis\"></head><body>ok</body>"
    val r = splitStr("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n$body")
    assert(r.getAs[String]("charset") == "utf-8")
    assert(r.getAs[String]("charset_source") == "header")
  }

  test("meta prescan: only the first 1024 bytes are consulted, and non-HTML types are not sniffed") {
    val pad = "<!-- " + ("x" * 1100) + " -->"
    val late = s"<html><head>$pad<meta charset=\"shift_jis\"></head><body>ok</body>"
    val r1 = splitStr("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${late.length}\r\n\r\n$late")
    assert(r1.isNullAt(r1.fieldIndex("charset")), "meta beyond 1024 bytes must not match")
    assert(r1.isNullAt(r1.fieldIndex("charset_source")))
    val body = "<meta charset=\"shift_jis\">not html"
    val r2 = splitStr("HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n$body")
    assert(r2.isNullAt(r2.fieldIndex("charset")), "binary media types are never sniffed")
  }

  test("BOM sniff: UTF-16LE and UTF-16BE bodies decode, charset_source='bom'") {
    // bytes are invalid UTF-8 (é is E9 00 / 00 E9) — a fallback decode
    // would be mojibake, so the assertions prove the BOM actually routed
    def msg(body: Array[Byte]): Array[Byte] =
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes(
        java.nio.charset.StandardCharsets.US_ASCII) ++ body
    val le = Array(0xFF.toByte, 0xFE.toByte) ++ "uni café 7</body>".getBytes("UTF-16LE")
    val rLe = split(msg(le))
    assert(rLe.getAs[String]("charset") == "utf-16le")
    assert(rLe.getAs[String]("charset_source") == "bom")
    assert(rLe.getAs[String]("body") == "uni café 7</body>")
    val be = Array(0xFE.toByte, 0xFF.toByte) ++ "uni café 9</body>".getBytes("UTF-16BE")
    val rBe = split(msg(be))
    assert(rBe.getAs[String]("charset") == "utf-16be")
    assert(rBe.getAs[String]("charset_source") == "bom")
    assert(rBe.getAs[String]("body") == "uni café 9</body>")
  }

  test("BOM precedence: beats a contradicting header charset AND the meta prescan") {
    // header says iso-8859-1, document says koi8-r, bytes say UTF-8 BOM —
    // WHATWG §13.2.3.1 puts the BOM above both; the ö/é decode proves it
    // (an iso-8859-1 read of the UTF-8 bytes yields 'bÃ¶mÃ©')
    val body = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "<html><head><meta charset=koi8-r></head><body>bömé</body>".getBytes(
        java.nio.charset.StandardCharsets.UTF_8)
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-8859-1\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)
    val r = split(head ++ body)
    assert(r.getAs[String]("charset") == "utf-8")
    assert(r.getAs[String]("charset_source") == "bom")
    // the mark is an encoding signature, not content: stripped from body
    assert(r.getAs[String]("body") ==
      "<html><head><meta charset=koi8-r></head><body>bömé</body>")
  }

  test("sniffBom table: signatures, prefixes, and too-short inputs") {
    def bom(bytes: Int*): String = HttpMessage.sniffBom(bytes.map(_.toByte).toArray)
    assert(bom(0xEF, 0xBB, 0xBF, 'x') == "utf-8")
    assert(bom(0xFE, 0xFF, 0x00, 'x') == "utf-16be")
    assert(bom(0xFF, 0xFE, 'x', 0x00) == "utf-16le")
    assert(bom(0xEF, 0xBB) == null, "truncated UTF-8 BOM is not a BOM")
    assert(bom(0xFE) == null)
    assert(bom() == null)
    assert(bom('h', 'i') == null)
    // a BOM-less non-ASCII UTF-8 body must not false-positive
    assert(HttpMessage.sniffBom("é".getBytes("UTF-8")) == null)
  }
}
