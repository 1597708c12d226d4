package graft

import graft.plans.JsonPaths
import org.apache.spark.unsafe.types.UTF8String

class JsonPathsSpec extends SparkSuite {

  private def pairs(js: String): Seq[(String, String)] = {
    val arr = JsonPaths.parse(UTF8String.fromString(js))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
    }
  }

  test("nested object and array paths with [*] collapse") {
    assert(pairs("""{"a": 1, "b": {"c": [true, null]}, "d": "x"}""") == Seq(
      "$" -> "object", "$.a" -> "number", "$.b" -> "object",
      "$.b.c" -> "array", "$.b.c[*]" -> "boolean", "$.b.c[*]" -> "null",
      "$.d" -> "string"))
  }

  test("paths inside string values never leak; escapes parse") {
    assert(pairs("""{"a": "{\"fake\": 1}", "b": "line\nuAend"}""") == Seq(
      "$" -> "object", "$.a" -> "string", "$.b" -> "string"))
  }

  test("number grammar: ints, negatives, fractions, exponents") {
    assert(pairs("""[0, -7, 3.25, 1e9, -2.5E-3]""") == Seq(
      "$" -> "array") ++ Seq.fill(5)("$[*]" -> "number"))
  }

  test("empty containers emit only the container node") {
    assert(pairs("""{"a": {}, "b": []}""") == Seq(
      "$" -> "object", "$.a" -> "object", "$.b" -> "array"))
  }

  test("malformed inputs collapse to ($, malformed)") {
    for (bad <- Seq("{\"k\": }", "{", "[1,]", "{\"a\":1} trailing",
      "\"unterminated", "{\"a\" 1}", "01", "tru", "-", "{'a':1}"))
      assert(pairs(bad) == Seq("$" -> "malformed"), s"input: $bad")
  }

  test("scalar roots profile as themselves") {
    assert(pairs("42") == Seq("$" -> "number"))
    assert(pairs("\"hi\"") == Seq("$" -> "string"))
    assert(pairs("null") == Seq("$" -> "null"))
  }
}
