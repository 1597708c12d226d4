package graft

import org.apache.spark.sql.functions._
import graft.text.Scripts

class ScriptsSpec extends SparkSuite {

  test("each planted script dominates its own phrase; the tie breaks by priority order") {
    val rows = Scripts.detected(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("script")).toMap
    val expect = Map(0L -> "latin", 1L -> "cyrillic", 2L -> "greek",
      3L -> "han", 4L -> "kana", 5L -> "arabic", 6L -> "latin")
    rows.foreach { case (id, s) =>
      assert(s == expect(id % 7), s"doc $id (class ${id % 7})")
    }
  }

  test("the mixed case is a GENUINE tie (14 latin vs 14 cyrillic letters)") {
    val r = Scripts.detected(spark, Sf)
      .filter(col("doc_id") % 7 === 6).limit(1).collect()(0)
    assert(r.getAs[Long]("latin") == 14L && r.getAs[Long]("cyrillic") == 14L,
      "the fixture tie must not silently drift")
    assert(r.getAs[String]("script") == "latin", "priority order breaks the tie")
  }

  test("digits, punctuation and spaces count in NO class; n_letters sums the classes") {
    import spark.implicits._
    val r = Scripts.detect(Seq((1L, "ab c, 42! привет")).toDF("doc_id", "text"))
      .collect()(0)
    assert(r.getAs[Long]("latin") == 3L)
    assert(r.getAs[Long]("cyrillic") == 6L)
    assert(r.getAs[Long]("n_letters") == 9L)
    val empty = Scripts.detect(Seq((2L, "123 ...")).toDF("doc_id", "text")).collect()(0)
    assert(empty.getAs[String]("script") == "none")
  }

  test("plan is map-only: no shuffle beyond the deliberate widen") {
    val plan = Scripts.detected(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
