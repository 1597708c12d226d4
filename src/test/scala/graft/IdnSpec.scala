package graft

import graft.plans.Idn

class IdnSpec extends SparkSuite {

  test("golden: ICANN test strings and the classic German labels, both directions") {
    val pairs = Seq(
      "bücher.example" -> "xn--bcher-kva.example",
      "münchen.de" -> "xn--mnchen-3ya.de",
      "δοκιμή.gr" -> "xn--jxalpdlp.gr",
      "испытание.ru" -> "xn--80akhbyknj4f.ru",
      "テスト.jp" -> "xn--zckzah.jp",
      "测试.cn" -> "xn--0zwm56d.cn",
      "shop.büro.example" -> "shop.xn--bro-hoa.example",
      "plain.example.com" -> "plain.example.com")
    pairs.foreach { case (uni, ascii) =>
      assert(Idn.toAsciiHost(uni) == ascii, s"encode $uni")
      assert(Idn.toUnicodeHost(ascii) == uni, s"decode $ascii")
    }
  }

  test("agrees with java.net.IDN on randomized multi-script lowercase labels") {
    val scripts = Seq(
      ('a' to 'z').mkString, "äöüé", "αβγδε", "абвгд", "あいうえ", "测试例字")
    val rnd = new scala.util.Random(11)
    (1 to 300).foreach { _ =>
      val label = (1 to (1 + rnd.nextInt(10))).map { _ =>
        val s = scripts(rnd.nextInt(scripts.size))
        s.charAt(rnd.nextInt(s.length))
      }.mkString
      val host = s"$label.example"
      val viaJdk = java.net.IDN.toASCII(host)
      assert(Idn.toAsciiHost(host) == viaJdk, s"host=$host")
      assert(Idn.toUnicodeHost(viaJdk) == host, s"round trip of $host")
    }
  }

  test("agrees with java.net.IDN on DEVIATION and mapped characters too " +
    "(ß, final sigma, ZWJ/ZWNJ, soft hyphen, ligature, full-width)") {
    val scripts = Seq(
      ('a' to 'z').mkString, "äöüé", "αβγδε", "абвгд",
      "ßς", "‌‍­", "ﬁﬀ", "ｅｘａ")
    val rnd = new scala.util.Random(23)
    var checked = 0
    (1 to 500).foreach { _ =>
      // anchor with a base letter so deletions cannot empty the label
      val label = "x" + (1 to rnd.nextInt(8)).map { _ =>
        val s = scripts(rnd.nextInt(scripts.size))
        s.charAt(rnd.nextInt(s.length))
      }.mkString
      val host = s"$label.example"
      val viaJdk = try Some(java.net.IDN.toASCII(host)) catch {
        case _: IllegalArgumentException => None // jdk rejects some combos
      }
      viaJdk.foreach { jdk =>
        assert(Idn.toAsciiHost(host) == jdk, s"host=${host.map(c => f"\\u$c%04x").mkString}")
        checked += 1
      }
    }
    assert(checked > 400, s"only $checked of 500 labels were comparable")
  }

  test("UTS-46 mapping goldens: the round-12 vectors, jdk-confirmed") {
    val vectors = Seq(
      "faß.de" -> "fass.de",
      "a‍b.example" -> "ab.example", // ZWJ deleted
      "ﬁrm.example" -> "firm.example", // NFKC ligature fold
      "ｅｘａｍｐｌｅ.com" -> "example.com", // NFKC width fold
      "σολος.gr" -> "xn--wxahbnd.gr", // final sigma -> sigma
      "STRASSE-ß.de" -> "strasse-ss.de")
    vectors.foreach { case (uni, ascii) =>
      assert(Idn.toAsciiHost(uni) == ascii, s"map $uni")
      assert(Idn.toAsciiHost(uni) == java.net.IDN.toASCII(uni), s"jdk parity $uni")
    }
  }

  test("prohibited code points REJECT the label verbatim, never a fake registry form") {
    assert(Idn.toAsciiHost("bad host.example") == "bad host.example")
    assert(Idn.toAsciiHost("Bad\u0007Bell.Example") == "Bad\u0007Bell.example",
      "rejected label passes through untouched; clean labels still lowercase")
    assert(Idn.toAsciiHost("ok\uE000pua.example") == "ok\uE000pua.example",
      "private-use survives mapping -> rejected verbatim")
    // deletion-only label maps to empty: degenerate but defined
    assert(Idn.toAsciiHost("\u200D.example") == ".example")
  }

  test("uppercase folds before encoding; malformed xn-- labels decode to themselves") {
    assert(Idn.toAsciiHost("BÜCHER.Example") == "xn--bcher-kva.example")
    assert(Idn.toUnicodeHost("xn--@@@.example") == "xn--@@@.example")
    assert(Idn.toUnicodeHost("xn--.example") == "xn--.example" ||
      Idn.toUnicodeHost("xn--.example") == ".example") // empty puny: degenerate
    assert(Idn.toAsciiHost("") == "")
  }

  test("the fixture gate rides the codegen'd expressions and round-trips in-plan") {
    val rows = graft.text.Canonical.idnHosts(spark, Sf).collect()
    rows.foreach { r =>
      assert(r.getString(3) == r.getString(1),
        s"display form must round-trip to the planted host: ${r.getString(1)}")
      assert(r.getString(2).split("\\.").forall(_.forall(_ < 128)),
        s"ascii form must be pure ASCII: ${r.getString(2)}")
    }
  }

  // ---- strict (nontransitional) residual: CONTEXTJ + BIDI ----

  test("CONTEXTJ: ZWJ legal only after virama; ZWNJ after virama or cursive break") {
    // Devanagari ka + virama + ZWJ + ssa: the eyelash-conjunct idiom
    assert(Idn.toAsciiHostStrict("\u0915\u094D\u200D\u0937.example") != null)
    // ZWJ with no virama before it
    assert(Idn.toAsciiHostStrict("\u0915\u200D\u0937.example") == null)
    // ZWJ label-initial
    assert(Idn.toAsciiHostStrict("\u200D\u0915.example") == null)
    // Persian heh + ZWNJ + alef: D (T)* ZWNJ (T)* R — the cursive break
    assert(Idn.toAsciiHostStrict(
      "\u0646\u0627\u0645\u0647\u200C\u0627\u06CC.example") ==
      "xn--mgba3gch31f060k.example")
    // ZWNJ between non-joining Latin letters
    assert(Idn.toAsciiHostStrict("a\u200Cb.example") == null)
    // ZWNJ after virama is licensed even without a joining context
    assert(Idn.toAsciiHostStrict("\u0915\u094D\u200C\u0937.example") != null)
    // ZWNJ after an R-joining letter (alef cannot join leftward)
    assert(Idn.toAsciiHostStrict("\u0627\u200C\u0628.example") == null)
  }

  test("BIDI: RFC 5893 label rules on RTL content") {
    // pure Hebrew: legal
    assert(Idn.toAsciiHostStrict("אבג.example") == "xn--4dbcd.example")
    // rule 1: an RTL label must not START with a European digit
    assert(Idn.toAsciiHostStrict("1אבג.example") == null)
    // rule 3: ending on EN is legal
    assert(Idn.toAsciiHostStrict("אבג" + "1.example") != null)
    // rule 4: EN and AN never mix in one RTL label (1 is EN, ٣ is AN)
    assert(Idn.toAsciiHostStrict("א" + "1٣.example") == null)
    // AN-only with RTL is legal
    assert(Idn.toAsciiHostStrict("א٣.example") != null)
    // an all-LTR label carries no bidi constraint
    assert(Idn.toAsciiHostStrict("plain.example.com") == "plain.example.com")
  }

  test("strict keeps deviations (nontransitional) where the default maps them") {
    assert(Idn.toAsciiHostStrict("faß.example") == "xn--fa-hia.example")
    assert(Idn.toAsciiHost("faß.example") == "fass.example")
    // both agree on non-deviation content
    assert(Idn.toAsciiHostStrict("bücher.example") == Idn.toAsciiHost("bücher.example"))
  }

  test("strict fixture gate: every rejection vector answers NULL in-plan") {
    val rows = graft.text.Canonical.idnHostsStrict(spark, Sf).collect()
    rows.foreach { r =>
      val rejected = Set(1L, 3L, 5L, 6L).contains(r.getLong(0) % 10)
      assert(r.isNullAt(2) == rejected,
        s"doc ${r.getLong(0)} host ${r.getString(1)}: strict=${if (r.isNullAt(2)) null else r.getString(2)}")
    }
  }
}
