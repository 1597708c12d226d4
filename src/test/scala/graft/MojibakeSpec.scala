package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.functions._
import graft.plans.FixMojibake

class MojibakeSpec extends SparkSuite {

  private def mangleLatin1(s: String): String =
    new String(s.getBytes(UTF_8), ISO_8859_1)
  private def mangleCp1252(s: String): String =
    new String(s.getBytes(UTF_8), java.nio.charset.Charset.forName("windows-1252"))

  test("inverts a single Latin-1 mis-decode on multi-script text") {
    val originals = Seq("café crème", "naïve façade", "Grüße aus Köln",
      "日本語のテキスト", "Ελληνικά", "русский текст", "emoji 🎉 too",
      "mixed: é日ß€")
    originals.foreach { o =>
      assert(FixMojibake.fix(mangleLatin1(o)) == o, s"latin1 round trip of $o")
    }
  }

  test("inverts a single cp1252 mis-decode (smart quotes, dashes, ellipsis)") {
    // NB: the JDK cp1252 decoder maps the five UNDEFINED bytes (0x81
    // 0x8D 0x8F 0x90 0x9D) to U+FFFD — information destroyed, not
    // mojibake; ” (UTF-8 E2 80 9D) is therefore unrecoverable through
    // the JDK flavor and excluded here. WHATWG-flavored decoders keep
    // those bytes as control chars — covered by the next test.
    val originals = Seq("don’t — stop…", "“quoted“ ‘text’", "™ and • and €",
      "œuvre Š ž")
    originals.foreach { o =>
      assert(FixMojibake.fix(mangleCp1252(o)) == o, s"cp1252 round trip of $o")
    }
  }

  test("inverts the WHATWG cp1252 flavor (undefined bytes kept as controls)") {
    // simulate a browser-style decode: defined bytes per cp1252, the
    // five undefined slots as their control code points
    def whatwg(s: String): String = {
      val b = s.getBytes(UTF_8)
      val sb = new StringBuilder
      b.foreach { by =>
        val v = by & 0xff
        val one = new String(Array(by), java.nio.charset.Charset.forName("windows-1252"))
        if (one == "�") sb.append(v.toChar) else sb.append(one)
      }
      sb.toString
    }
    val originals = Seq("“quoted” ‘text’", "don’t”…")
    originals.foreach { o =>
      assert(FixMojibake.fix(whatwg(o)) == o, s"whatwg round trip of $o")
    }
  }

  test("inverts DOUBLE mis-decodes through either codepage") {
    val originals = Seq("café", "日本", "don’t")
    originals.foreach { o =>
      assert(FixMojibake.fix(mangleLatin1(mangleLatin1(o))) == o, s"2x latin1 $o")
      assert(FixMojibake.fix(mangleCp1252(mangleCp1252(o))) == o, s"2x cp1252 $o")
      assert(FixMojibake.fix(mangleCp1252(mangleLatin1(o))) == o, s"mixed hops $o")
    }
  }

  test("genuine text is left alone: ASCII, extended Latin, CJK, already-clean") {
    val genuine = Seq("plain ascii", "Grüße", "über façade", "côté α",
      "日本語", "já foi", "")
    genuine.foreach { g =>
      assert(FixMojibake.fix(g) == g, s"must not touch $g")
    }
  }

  test("idempotent: fixing fixed text changes nothing") {
    val inputs = Seq(mangleLatin1("café"), mangleLatin1(mangleLatin1("日本")),
      "Grüße", "plain")
    inputs.foreach { in =>
      val once = FixMojibake.fix(in)
      assert(FixMojibake.fix(once) == once, s"idempotence on $in")
    }
  }

  test("past the hop ceiling the ORIGINAL comes back — idempotence survives depth") {
    // 4-deep nesting: MaxRounds (3) hops would leave a 1-hop-broken
    // string on which fix() would still progress; the contract is to
    // return the untouched input instead
    val deep = mangleLatin1(mangleLatin1(mangleLatin1(mangleLatin1("café"))))
    val out = FixMojibake.fix(deep)
    assert(out == deep, "must not partially unwind")
    assert(FixMojibake.fix(out) == out, "idempotence at depth 4")
    // exactly at the ceiling the repair still completes
    assert(FixMojibake.fix(mangleLatin1(mangleLatin1(mangleLatin1("café")))) == "café")
  }

  test("unmappable characters stop the reversal cold (no partial repair)") {
    // a CJK char has no single-byte origin: even though the rest of the
    // string looks like mojibake, the whole string is returned verbatim
    val s = "cafÃ© 日"
    assert(FixMojibake.fix(s) == s)
  }

  test("the gate vectors repair in-plan and the fixture covers all classes") {
    val out = text.Mojibake.repaired(spark, Sf).collect()
    assert(out.length > 0)
    out.foreach { r =>
      val (raw, fixed) = (r.getString(1), r.getString(2))
      assert(FixMojibake.fix(raw) == fixed)
      (r.getLong(0) % 6).toInt match {
        case 0 | 3 => assert(raw == fixed, s"identity class: $raw")
        case _ => assert(raw != fixed, s"repair class must change: $raw")
      }
    }
  }
}
