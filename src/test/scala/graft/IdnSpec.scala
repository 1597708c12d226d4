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
    // no ß (nameprep maps it to "ss") and no final sigma — the declared
    // simplification is lowercase-only mapping, so the agreement
    // property holds on characters nameprep leaves alone
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
}
