package graft

import org.apache.spark.sql.functions._

import graft.text.{QualityModel, QualityTrain}

/** The native quality-classifier trainer: exact fixed-point log₂
  * quantization, class counting, and the train→score composition the
  * real pipelines run. The fixture corpus's vocabulary is label-uniform
  * by design (trained weights correctly ≈ 0 there — pinned); the
  * discriminative claims train on planted marker corpora.
  */
class QualityTrainSpec extends SparkSuite {

  import spark.implicits._

  test("log2fp: exact anchors, monotone over a dense range, 16/octave") {
    val xs = (1L to 5000L) ++ Seq(1L << 20, (1L << 20) + 7, 1L << 40, (1L << 50) - 1)
    val got = xs.toDF("x")
      .select(col("x"), expr(QualityTrain.log2fpSparkSql("x")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact powers of two: 16 * k
    for (k <- 0 to 12) assert(got(1L << k) == 16L * k, s"2^$k")
    assert(got(1L << 20) == 320L)
    assert(got(1L << 40) == 640L)
    // monotone (non-decreasing) across the dense range
    (1L until 5000L).foreach(x => assert(got(x) <= got(x + 1), s"at $x"))
    // within-octave interpolation stays inside [16k, 16(k+1))
    assert(got(3L) == 16L + (3L * 16 / 2) - 16 && got(3L) >= 16L && got(3L) < 32L)
    assert(got((1L << 20) + 7) == 320L, "tiny remainders floor away")
  }

  test("trained weights discriminate planted markers: pos marker > 0 > neg marker") {
    // 20 positive docs rich in 'excellentmarker', 20 negative rich in
    // 'awfulmarker', shared filler both sides
    val filler = "alpha beta gamma delta"
    val pos = (0 until 20).map(i => (s"$filler excellentmarker excellentmarker excellentmarker", true))
    val neg = (0 until 20).map(i => (s"$filler awfulmarker awfulmarker awfulmarker", false))
    val lab = (pos ++ neg).toDF("text", "label")
    val model = QualityTrain.trainDocs(lab)
    val slotOfTok = (t: String) =>
      Seq(t).toDF("t").select(graft.sim.DocEmbedding.slotOf(col("t"))).head().getLong(0)
    val w = model.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (posSlot, negSlot) = (slotOfTok("excellentmarker"), slotOfTok("awfulmarker"))
    assert(w(posSlot)._1 == 60L && w(posSlot)._2 == 0L, "pos marker counts")
    assert(w(negSlot)._1 == 0L && w(negSlot)._2 == 60L, "neg marker counts")
    assert(w(posSlot)._3 > 0L, s"pos marker weight ${w(posSlot)._3}")
    assert(w(negSlot)._3 < 0L, s"neg marker weight ${w(negSlot)._3}")
    // shared filler slots sit near zero, strictly between the markers
    val fillerSlot = slotOfTok("alpha")
    assert(math.abs(w(fillerSlot)._3) < w(posSlot)._3)
  }

  test("composition: the trained table drives the X75 scorer to the right verdicts") {
    val filler = "alpha beta gamma delta"
    val lab = ((0 until 20).map(_ => (s"$filler excellentmarker excellentmarker excellentmarker", true))
      ++ (0 until 20).map(_ => (s"$filler awfulmarker awfulmarker awfulmarker", false))).toDF("text", "label")
    val model = QualityTrain.trainDocs(lab).select(col("slot"), col("w"))
    // held-out docs: marker-dominant each way
    val held = Seq(
      (1L, "excellentmarker excellentmarker alpha"),
      (2L, "awfulmarker awfulmarker beta")).toDF("doc_id", "text")
    val verdicts = QualityModel.scoreDocs(held, model)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(verdicts(1L), "positive-marker doc must be kept")
    assert(!verdicts(2L), "negative-marker doc must be dropped")
  }

  test("fixture seed: both label classes populated; label-uniform vocab trains ~zero weights") {
    val s = QualityTrain.seed(spark, Sf)
    val byLabel = s.groupBy(col("label")).count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byLabel.getOrElse(true, 0L) > 0 && byLabel.getOrElse(false, 0L) > 0,
      s"threshold must split the fixture: $byLabel")
    val ws = QualityTrain.train(spark, Sf).select(col("w")).as[Long].collect()
    assert(ws.nonEmpty)
    // the fixture's vocabulary carries no label signal by construction:
    // every slot's log-odds stays within ONE bit of zero (small-count
    // slots wobble; a marker-planted corpus trains multi-bit weights —
    // see the discrimination test above)
    assert(ws.forall(w => math.abs(w) <= 16L),
      s"label-uniform vocab should train near-zero weights, got ${ws.min}..${ws.max}")
  }

  test("incremental training: merged batch counts train the IDENTICAL model") {
    import org.apache.spark.sql.functions.col
    val whole = QualityTrain.train(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val merged = QualityTrain.trainMerged(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(merged == whole, "count additivity must make the two bit-identical")
    // a three-way partition merges the same way
    val s = QualityTrain.seed(spark, Sf)
    val three = QualityTrain.weightsOf(QualityTrain.mergeCounts(
      QualityTrain.countsOf(s.filter(col("doc_id") % 3 === 0)),
      QualityTrain.countsOf(s.filter(col("doc_id") % 3 === 1)),
      QualityTrain.countsOf(s.filter(col("doc_id") % 3 === 2)))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(three == whole)
  }

  test("held-out eval on the fixture: consistent confusion cells and bp formulas") {
    val r = QualityTrain.evalHoldout(spark, Sf).collect()(0)
    val (n, tp, fp, fn, tn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n > 0 && tp + fp + fn + tn == n)
    assert(r.getLong(5) == 10000 * (tp + tn) / n)
    if (tp + fp > 0) assert(r.getLong(6) == 10000 * tp / (tp + fp))
    if (tp + fn > 0) assert(r.getLong(7) == 10000 * tp / (tp + fn))
  }

  test("a discriminative planted model evaluates at F1 = 10000 on marker held-outs") {
    val filler = "alpha beta gamma delta"
    val lab = ((0 until 20).map(_ => (s"$filler excellentmarker excellentmarker excellentmarker", true))
      ++ (0 until 20).map(_ => (s"$filler awfulmarker awfulmarker awfulmarker", false))).toDF("text", "label")
    val model = QualityTrain.trainDocs(lab).select(col("slot"), col("w"))
    val held = Seq(
      (1L, "excellentmarker excellentmarker alpha", true),
      (2L, "awfulmarker awfulmarker beta", false),
      (3L, "excellentmarker gamma excellentmarker", true)).toDF("doc_id", "text", "label")
    val pred = QualityModel.scoreDocs(held.select(col("doc_id"), col("text")), model)
      .select(col("doc_id"), col("keep"))
    val cells = held.join(pred, Seq("doc_id"), "left")
      .select(col("label"), coalesce(col("keep"), lit(false)).as("p"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    assert(cells.forall { case (l, p) => l == p }, "perfect separation expected")
  }
}
