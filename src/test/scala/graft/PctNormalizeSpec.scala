package graft

import graft.plans.PctNormalize

class PctNormalizeSpec extends SparkSuite {

  test("golden: uppercase hex, decode unreserved, keep reserved, pass malformed") {
    val cases = Seq(
      "/a/%7euser" -> "/a/~user",
      "/a/%7Euser" -> "/a/~user",
      "/b/%41%42%63d" -> "/b/ABcd",
      "/c%2fd?x=%2f" -> "/c%2Fd?x=%2F", // '/' is reserved: stays encoded
      "/d/%3a%2b" -> "/d/%3A%2B",       // ':' '+' reserved: stays, uppercased
      "%2D%2e%5F%7e" -> "-._~",          // the full unreserved punct set
      "%20" -> "%20",                    // space is NOT unreserved
      "/e/%G1%" -> "/e/%G1%",            // malformed + trailing %: untouched
      "%4" -> "%4",                      // truncated escape at end
      "" -> "",
      "plain" -> "plain")
    cases.foreach { case (in, want) =>
      assert(PctNormalize.normalize(in) == want, s"in=$in")
    }
  }

  test("idempotent on random escape soup (normalize . normalize = normalize)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab%0129AFxf~._-/?=&G"
    (1 to 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(24))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val once = PctNormalize.normalize(s)
      assert(PctNormalize.normalize(once) == once, s"not idempotent on $s")
    }
  }

  test("decoded escapes agree with java.net.URLDecoder on unreserved-only inputs") {
    // URLDecoder decodes EVERY escape; on inputs whose escapes are all
    // unreserved the two must agree exactly
    val unreserved = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~')
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val s = (1 to rnd.nextInt(12)).map { _ =>
        val c = unreserved(rnd.nextInt(unreserved.size))
        if (rnd.nextBoolean()) f"%%${c.toInt}%02x" else c.toString
      }.mkString
      assert(PctNormalize.normalize(s) ==
        java.net.URLDecoder.decode(s, "UTF-8"), s"in=$s")
    }
  }

  test("the expression is codegen'd and matches the static function on the fixture plant") {
    import org.apache.spark.sql.functions._
    val rows = graft.text.Canonical.pctNormalized(spark, Sf)
      .collect()
    rows.foreach { r =>
      assert(r.getString(2) == PctNormalize.normalize(r.getString(1)))
    }
    val plan = graft.text.Canonical.pctNormalized(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("encode: grammars, UTF-8 multibyte, and the normalize-of-encode fixpoint") {
    import graft.plans.PctEncode
    assert(PctEncode.encode("a b&c", false) == "a%20b&c")
    assert(PctEncode.encode("a b&c", true) == "a%20b%26c")
    assert(PctEncode.encode("café", true) == "caf%C3%A9")
    assert(PctEncode.encode("q=1/2", false) == "q=1%2F2")
    assert(PctEncode.encode("100%+", true) == "100%25%2B")
    // encoded output is ALREADY in 6.2.2 normal form
    val rnd = new scala.util.Random(3)
    val alphabet = "ab c/&=+%\u00e9\u043f~._-"
    (1 to 300).foreach { _ =>
      val s0 = Seq.fill(rnd.nextInt(16))(alphabet(rnd.nextInt(alphabet.length))).mkString
      for (q <- Seq(true, false)) {
        val enc = PctEncode.encode(s0, q)
        assert(PctNormalize.normalize(enc) == enc, s"not normal: $s0 -> $enc")
        // round trip through the JDK's independent decoder (no '+'-as-space
        // hazard: query mode escapes '+', path mode never emits one from ' ')
        assert(java.net.URLDecoder.decode(
          if (q) enc else enc.replace("+", "%2B"), "UTF-8") == s0, s"round trip $s0")
      }
    }
  }
}
