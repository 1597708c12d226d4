package graft

import org.apache.spark.sql.functions._
import graft.ops.DateParse

class DateParseSpec extends SparkSuite {

  private def parse(vals: String*): Seq[Option[java.sql.Timestamp]] = {
    import spark.implicits._
    vals.toDF("s").select(DateParse.multiFormatTimestamp(col("s")))
      .collect().map(r => Option(r.getTimestamp(0))).toSeq
  }

  test("every declared format shape parses; first-match order holds") {
    val out = parse(
      "2020-03-15 10:20:30.5",
      "2020-03-15 10:20:30.55",
      "2020-03-15 10:20:30.555",
      "2020-03-15",
      "2020-03-15T10:20:30",
      "1584267630000") // epoch_millis of 2020-03-15T10:20:30Z
    assert(out.forall(_.isDefined))
    assert(out(3).get === java.sql.Timestamp.valueOf("2020-03-15 00:00:00"))
    assert(out(4).get === out(5).get, "ISO and epoch_millis of the same instant agree")
    assert(out(0).get === java.sql.Timestamp.valueOf("2020-03-15 10:20:30.5"))
  }

  test("strict_date_optional_time offset and reduced-precision shapes parse to the right instants") {
    val out = parse(
      "2020-03-15T10:20:30Z",           // zero offset, 'Z' notation
      "2020-03-15T11:20:30+01:00",      // same instant, nonzero offset
      "2020-03-15T11:20:30.000+01:00",  // offset with fraction
      "2020-03-15T10:20",               // minute precision
      "2020-03-15T10")                  // hour precision
    assert(out.forall(_.isDefined))
    assert(out(0).get === java.sql.Timestamp.valueOf("2020-03-15 10:20:30"))
    assert(out(1).get === out(0).get, "+01:00 offset must normalize to the same instant")
    assert(out(2).get === out(0).get)
    assert(out(3).get === java.sql.Timestamp.valueOf("2020-03-15 10:20:00"))
    assert(out(4).get === java.sql.Timestamp.valueOf("2020-03-15 10:00:00"))
  }

  test("unacceptable values coerce to NULL (the ES reject channel), digits gate epoch") {
    val out = parse("not a date", "03/15/2020", "123") // short digit runs are NOT epoch_millis
    assert(out.forall(_.isEmpty))
  }
}
