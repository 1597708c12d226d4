package graft

import org.apache.spark.sql.functions._
import graft.ops.DateParse

/** Pins the fraction-digit acceptance boundary of the format chain: the
  * ES declaration stops at `.SSS`, so 1–3 fractional digits parse and
  * 4+ coerce to NULL. (Measured: a Spark fraction pattern's count is the
  * MAXIMUM digits accepted — `.SSS` parses 1–3 — so the DuckDB twin's
  * `%f` branches are regex-gated to the same 1–3 window.)
  */
class DateParseBoundarySpec extends SparkSuite {
  test("1-3 fractional digits parse; 4+ coerce to NULL on the whole chain") {
    import spark.implicits._
    val inputs = Seq(
      "2020-03-15 10:20:30.5", "2020-03-15 10:20:30.55", "2020-03-15 10:20:30.555",
      "2020-03-15 10:20:30.5555", "2020-03-15 10:20:30.555555",
      "2020-03-15T10:20:30.555", "2020-03-15T10:20:30.5555")
    val out = inputs.toDF("s")
      .select(DateParse.multiFormatTimestamp(col("s"))).collect().map(r => !r.isNullAt(0))
    assert(out.toSeq === Seq(true, true, true, false, false, true, false))
  }
}
