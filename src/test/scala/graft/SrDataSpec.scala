package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.SrData

class SrDataSpec extends SparkSuite {

  test("flagship returns rows with the full 21-column reference shape") {
    val df = SrData.flagship(spark, Sf)
    assert(df.columns.length == 21)
    assert(df.columns.contains("Incident_Number"))
    assert(df.count() > 0)
  }

  test("LIKE [_] escape translation: pattern matches literal underscore only") {
    import spark.implicits._
    val df = Seq("NATION_1", "NATION_21", "NATIONX1", "NATION_12").toDF("s")
    val got = df.filter(col("s").like("%\\_1")).as[String].collect().toSet
    // %\_1 = ends with literal "_1": NATION_1 only (NATION_21 ends "_21")
    assert(got == Set("NATION_1"))
    val mid = df.filter(col("s").like("%\\_1%")).as[String].collect().toSet
    assert(mid == Set("NATION_1", "NATION_12"))
  }

  test("NOT IN null semantics: null in probe column drops the row") {
    import spark.implicits._
    val df = Seq(Some("A"), Some("B"), None).toDF("v")
    val kept = df.filter(!col("v").isin("A")).collect().map(_.getString(0))
    assert(kept.toSeq == Seq("B")) // NULL NOT IN (...) is NULL -> dropped
  }

  test("datediff argument order: Spark datediff(end, start)") {
    import spark.implicits._
    val d = Seq(("2020-01-01", "2020-01-11")).toDF("a", "b")
      .select(datediff(col("b").cast("date"), col("a").cast("date")).as("d"))
      .head().getInt(0)
    assert(d == 10)
  }

  test("TAT fallback chain exercises all three branches") {
    val df = SrData.flagship(spark, Sf)
    val branches = df.select(
      sum(when(col("last_resolved_date").isNotNull, 1).otherwise(0)).as("resolved"),
      sum(when(col("last_resolved_date").isNull && col("Close_Date").isNotNull, 1).otherwise(0)).as("closed"),
      sum(when(col("last_resolved_date").isNull && col("Close_Date").isNull, 1).otherwise(0)).as("now")
    ).head()
    assert(branches.getLong(0) > 0 && branches.getLong(1) > 0 && branches.getLong(2) > 0)
  }

  test("filtered: null-rejecting WHERE turns left joins inner (no null dims survive)") {
    val df = SrData.filtered(spark, Sf, "3-1997")
    assert(df.filter(col("Description").isNull).count() == 0)
    assert(df.count() > 0)
  }

  test("month_year is unpadded like the reference CONCAT(MONTH(),'-',YEAR())") {
    val df = SrData.flagship(spark, Sf)
    val some = df.select("month_year").distinct().collect().map(_.getString(0))
    assert(some.exists(_.matches("^[1-9]-\\d{4}$"))) // single-digit month, no zero pad
  }

  test("sargable month filter returns identical rows to the derived-expression form") {
    val derived = SrData.filtered(spark, Sf, "3-1997")
    val sargable = SrData.filteredSargable(spark, Sf, "3-1997")
    assert(derived.exceptAll(sargable).isEmpty && sargable.exceptAll(derived).isEmpty)
    assert(sargable.count() > 0)
  }

  test("date range reaches the parquet scan pushed — explicitly AND via SargableMonthRule") {
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // (plan rendering truncates long filter lists, so match the prefix)
    val sarg = planOf(SrData.filteredSargable(spark, Sf, "3-1997"))
    assert(sarg.contains("GreaterThanOrEqual(o_"),
      "date range must reach the orders scan as a pushed filter")
    // the faithful concat-month form is unprunable as written, but the
    // injected optimizer rule rewrites it to the same sargable range
    val derived = planOf(SrData.filtered(spark, Sf, "3-1997"))
    assert(derived.contains("GreaterThanOrEqual(o_"),
      "SargableMonthRule should upgrade the faithful month predicate to a pushed range")
  }

  test("month bucket range parses unpadded reference keys") {
    assert(SrData.monthBucketRange("3-1997") == ("1997-03-01", "1997-04-01"))
    assert(SrData.monthBucketRange("12-1999") == ("1999-12-01", "2000-01-01"))
  }
}
