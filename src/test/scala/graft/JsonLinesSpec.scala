package graft

import org.apache.spark.sql.functions._

import graft.sources.JsonLines

class JsonLinesSpec extends SparkSuite {

  import spark.implicits._

  private def parse(lines: (Long, String)*) =
    JsonLines.parse(lines.toSeq.toDF("doc_id", "line"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)), Option(r.get(5))))).toMap

  test("malformed lines quarantine with null fields; they never throw or vanish") {
    val out = parse(
      (1L, """{"k": 5, "s"""), // truncated
      (2L, "not json at all"),
      (3L, """{"k": 5, "s": "ok"}"""))
    assert(out(1L)._1 == false && out(1L)._2.isEmpty)
    assert(out(2L)._1 == false)
    assert(out(3L) == ((true, Some(5L), Some("ok"), None, None)))
    assert(out.size == 3, "quarantined lines must still produce rows")
  }

  test("a wrong-typed field nulls that field only; the rest of the line loads") {
    val out = parse((1L, """{"k": "oops", "s": "fine"}"""))
    assert(out(1L) == ((true, None, Some("fine"), None, None)))
  }

  test("missing paths are null; nested scalars and array elements extract by path") {
    val out = parse(
      (1L, """{"k": 7}"""),
      (2L, """{"k": 1, "o": {"x": 42}, "s": "v"}"""),
      (3L, """{"k": 1, "a": [10, 20, 30]}"""))
    assert(out(1L) == ((true, Some(7L), None, None, None)))
    assert(out(2L)._4 == Some(42L))
    assert(out(3L)._5 == Some(20L), "$.a[1] is the SECOND element (0-based JSONPath)")
  }

  test("the load report partitions the lines exactly") {
    val r = JsonLines.loadReport(spark, Sf).collect()(0)
    assert(r.getLong(0) == r.getLong(1) + r.getLong(2), "lines = valid + quarantined")
    assert(r.getLong(2) > 0, "fixture must exercise quarantine")
    assert(r.getLong(3) > 0 && r.getLong(4) > 0)
  }
}
