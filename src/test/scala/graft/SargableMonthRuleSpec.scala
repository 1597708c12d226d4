package graft

import org.apache.spark.sql.functions._
import graft.ops.SrData

class SargableMonthRuleSpec extends SparkSuite {

  test("rewritten predicate selects exactly the rows of the original") {
    val derived = SrData.filtered(spark, Sf, "3-1997")    // rule rewrites this
    val manual = SrData.filteredSargable(spark, Sf, "3-1997")
    assert(derived.exceptAll(manual).isEmpty && manual.exceptAll(derived).isEmpty)
    assert(derived.count() > 0)
  }

  test("fires on both orientations of the equality") {
    val o = Tables.orders(spark, Sf)
    val pred = concat_ws("-", month(col("o_orderdate")), year(col("o_orderdate")))
    val a = o.filter(pred === "3-1997")
    val b = o.filter(lit("3-1997") === pred)
    for (df <- Seq(a, b)) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("concat_ws"), s"concat form should be rewritten away:\n$plan")
      assert(df.count() === a.count())
    }
  }

  test("does not fire on a zero-padded literal (unmatchable by the unpadded concat)") {
    val o = Tables.orders(spark, Sf)
    val df = o.filter(
      concat_ws("-", month(col("o_orderdate")), year(col("o_orderdate"))) === "03-1997")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("concat_ws"), "padded bucket must be left alone")
    assert(df.count() === 0, "the reference's padded-key bug: matches nothing")
  }

  test("does not fire when month and year come from different expressions") {
    // parquet-backed (a literal frame would constant-fold the whole filter)
    val o = Tables.orders(spark, Sf)
    val df = o.filter(
      concat_ws("-", month(col("o_orderdate")), year(date_add(col("o_orderdate"), 370))) === "3-1997")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("concat_ws"), "mixed-expression month/year must be left alone")
  }

  test("fires on a genuine DateType column (not just timestamp-under-cast)") {
    val p = java.nio.file.Files.createTempDirectory("graft-datecol").toString + "/t"
    Tables.orders(spark, Sf).select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
      .write.parquet(p)
    val df = spark.read.parquet(p)
      .filter(concat_ws("-", month(col("d")), year(col("d"))) === "3-1997")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("concat_ws"), s"DateType branch should rewrite too:\n$plan")
    val expected = spark.read.parquet(p)
      .filter(col("d") >= lit("1997-03-01").cast("date") && col("d") < lit("1997-04-01").cast("date"))
    assert(df.count() === expected.count() && df.count() > 0)
  }

  test("null dates are dropped by both forms alike") {
    import spark.implicits._
    val df = Seq(Some("1997-03-15"), None).toDF("s")
      .select(col("s").cast("timestamp").as("d"))
    val derived = df.filter(concat_ws("-", month(col("d")), year(col("d"))) === "3-1997")
    assert(derived.count() === 1)
  }

  test("negated month predicate keeps null-date rows (rewrite is false, not NULL, for NULL)") {
    // concat_ws('-', month(NULL), year(NULL)) = '' -> pred is FALSE for a
    // null date, so NOT(pred) KEEPS the row. A bare range rewrite would be
    // NULL under NOT and silently drop it — the rewrite must carry
    // IsNotNull so it stays false in every boolean context.
    import spark.implicits._
    val df = Seq(Some("1997-03-15"), Some("1997-05-20"), None).toDF("s")
      .select(col("s").cast("timestamp").as("d"))
    val negated = df.filter(!(concat_ws("-", month(col("d")), year(col("d"))) === "3-1997"))
    val plan = negated.queryExecution.optimizedPlan.toString
    assert(!plan.contains("concat_ws"), s"rule should fire under Not too:\n$plan")
    assert(negated.count() === 2, "May row AND the null-date row survive NOT, as pre-rewrite")
  }
}
