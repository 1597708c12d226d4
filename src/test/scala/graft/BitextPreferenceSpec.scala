package graft

import org.apache.spark.sql.functions._

class BitextPreferenceSpec extends SparkSuite {

  // ---- bitext screen ----

  test("bitext: every class lands in its rule and all four verdicts appear") {
    val out = text.Bitext.screened(spark, Sf).persist()
    val byClass = out.withColumn("cls", col("pair_id") % 4)
      .groupBy("cls").agg(collect_set(col("verdict")).as("vs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    out.unpersist()
    assert(byClass(1L) == Set("too_short"))
    assert(byClass(2L) == Set("bad_ratio"))
    assert(byClass(3L) == Set("copy"))
    assert(byClass(0L) contains "kept")
  }

  test("bitext: rules apply first-rejecting-wins on hand cases") {
    import spark.implicits._
    val cases = Seq(
      (1L, "one two", "uno dos tres"), // src too short wins over everything
      (2L, "alpha beta gamma", "x"), // tgt too short
      (3L, "alpha beta gamma", "alpha beta gamma"), // copy
      (4L, "alpha beta gamma delta", "alfa betta gama delt"), // kept
      (5L, "alpha beta gamma", "alpha beta gamma " * 5)) // ratio before copy
      .toDF("pair_id", "src", "tgt")
    val got = text.Bitext.screen(cases).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(got(1L) == "too_short")
    assert(got(2L) == "too_short")
    assert(got(3L) == "copy")
    assert(got(4L) == "kept")
    assert(got(5L) == "bad_ratio", "ratio rule fires before the copy rule")
  }

  test("bitext: signals are exact integers (spot-check the copy class)") {
    val row = text.Bitext.screened(spark, Sf)
      .filter(col("pair_id") % 4 === 3).limit(1).collect()(0)
    assert(row.getLong(3) == 10000L, "verbatim copy has ratio exactly 10000 bp")
    assert(row.getLong(4) == 10000L, "verbatim copy has jaccard exactly 10000 bp")
  }

  // ---- preference pairs ----

  test("preference: chosen/rejected are the true extremes, ties by cand_id") {
    import spark.implicits._
    val cands = Seq(
      (1L, 10L, 2L), (1L, 11L, 0L), (1L, 12L, 2L), (1L, 13L, 1L), // tie at top
      (2L, 20L, 1L), (2L, 21L, 1L), // all tied -> no pair
      (3L, 30L, 0L), (3L, 31L, 2L))
      .toDF("prompt_id", "cand_id", "rating")
    val got = text.Preference.pairsOf(cands).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5))).toSet
    assert(got == Set(
      (1L, 10L, 11L, 2L), // chosen: rating-2 tie broken to cand 10; rejected 11
      (3L, 31L, 30L, 2L)))
  }

  test("preference: the fixture exercises the no-pair (all-tied) path") {
    val prompts = text.Preference.rated(spark, Sf)
      .select("prompt_id").distinct().count()
    val pairs = text.Preference.pairs(spark, Sf).count()
    assert(pairs < prompts, "some prompts must tie flat and emit no pair")
    assert(pairs > 0)
  }

  test("preference: one prompt-keyed exchange, no self-join") {
    val plan = text.Preference.pairs(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"extremes must come from windows, not a self-join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"one prompt shuffle expected, got $exchanges:\n$plan")
  }
}
