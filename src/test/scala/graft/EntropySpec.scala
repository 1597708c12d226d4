package graft

import org.apache.spark.sql.functions._
import graft.plans.CharEntropy

class EntropySpec extends SparkSuite {

  test("log2fp tracks 16*log2 within the chord bound and stays monotone") {
    // the within-octave linear chord UNDERESTIMATES log2(1+f) by at
    // most ~0.0861 bits ≈ 1.38 sixteenths; with the floor that is ≤ 2
    var prev = -1L
    (1L to 5000L).foreach { x =>
      val got = CharEntropy.log2fp(x)
      val real = math.floor(16 * math.log(x.toDouble) / math.log(2)).toLong
      assert(got <= real && real - got <= 2, s"x=$x got=$got real=$real")
      assert(got >= prev, s"monotonicity at $x")
      prev = got
    }
    // exact on powers of two
    (0 to 40).foreach(k => assert(CharEntropy.log2fp(1L << k) == 16L * k))
  }

  test("closed-form histograms: uniform alphabets score exact bits") {
    // "aabb": 2 symbols, uniform -> exactly 1 bit/char in sixteenths
    val r1 = CharEntropy.compute("aabb")
    assert(r1.getLong(0) == 4 && r1.getLong(1) == 2 && r1.getLong(2) == 4 * 16)
    // "abcd": 4 symbols uniform -> 2 bits/char
    val r2 = CharEntropy.compute("abcd")
    assert(r2.getLong(2) == 4 * 32)
    // single symbol -> zero entropy
    val r3 = CharEntropy.compute("aaaaaaaa")
    assert(r3.getLong(1) == 1 && r3.getLong(2) == 0)
    // empty -> zeros, never null
    val r4 = CharEntropy.compute("")
    assert(r4.getLong(0) == 0 && r4.getLong(1) == 0 && r4.getLong(2) == 0)
  }

  test("astral code points count once (emoji are one char, not two)") {
    val r = CharEntropy.compute("🎉🎉🎉🎉")
    assert(r.getLong(0) == 4 && r.getLong(1) == 1 && r.getLong(2) == 0)
  }

  test("the three planted regimes separate cleanly and exactly") {
    val out = text.Entropy.report(spark, Sf).persist()
    val byClass = out.withColumn("cls", col("doc_id") % 3)
      .groupBy("cls").agg(
        min(col("entropy_milli")).as("mn"), max(col("entropy_milli")).as("mx"),
        collect_set(col("verdict")).as("vs"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[String](3).toSet)).toMap
    out.unpersist()
    // repetition: exactly 1 bit/char regardless of length
    assert(byClass(1L) == ((1000L, 1000L, Set("repetitive"))))
    // rotating base64 blob: exactly 6 bits/char (uniform 64-symbol law)
    assert(byClass(2L) == ((6000L, 6000L, Set("random"))))
    // real corpus text: natural band, strictly between the cut points
    val (mn, mx, vs) = byClass(0L)
    assert(vs == Set("natural"), s"real text verdicts: $vs")
    assert(mn > text.Entropy.RepetitiveMax && mx < text.Entropy.RandomMin,
      s"natural band [$mn, $mx] must clear both thresholds")
  }

  test("plan shape: per-row expression, no shuffle before the verdict") {
    val plan = text.Entropy.report(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashAggregate"),
      s"entropy must not shuffle or aggregate:\n$plan")
  }
}
