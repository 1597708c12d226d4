package graft

import org.apache.spark.sql.functions._

import graft.plans.UnigramSegment
import graft.text.Unigram

/** Viterbi unigram segmentation: the expression against a brute-force
  * enumerator over every fixture word, hand-built model behavior, model
  * totality, and the shuffle-free per-row plan.
  */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  /** All segmentations of `word` into pieces ≤ MaxPieceLen present in
    * `model`, minimized on the same packed (cost·64 + n_pieces) integer.
    */
  private def brute(word: String, model: Map[String, Long]): Option[(Long, Long)] = {
    def go(i: Int): Option[Long] =
      if (i == word.length) Some(0L)
      else (1 to math.min(UnigramSegment.MaxPieceLen, word.length - i)).flatMap { k =>
        model.get(word.substring(i, i + k))
          .flatMap(c => go(i + k).map(rest => c * 64L + 1L + rest))
      }.minOption
    go(0).map(p => (p / 64L, p % 64L))
  }

  test("expression equals brute-force enumeration on every fixture word") {
    val docs = Tables.documents(spark, Sf)
    val (pieces, costs) = Unigram.collectModel(docs)
    val model = pieces.zip(costs).toMap
    val got = Unigram.segmentWordsOf(docs).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("cost_bits"), r.getAs[Long]("n_pieces"))))
      .toMap
    assert(got.nonEmpty)
    got.foreach { case (w, res) =>
      assert(brute(w, model).contains(res), s"word '$w': got $res, brute ${brute(w, model)}")
    }
  }

  test("hand model: frequent long pieces win; ties prefer fewer pieces") {
    // model: a=3, b=3, ab=2, abab=1  → "abab" best = [abab] cost 1
    // "aab" best = [a, ab] cost 5 over [a,a,b] cost 9
    val docs = Seq((1L, "x")).toDF("doc_id", "text") // dummy, not used
    val pieces = Array("a", "ab", "abab", "b")
    val costs = Array(3L, 2L, 1L, 3L)
    val out = Seq("abab", "aab", "ba").toDF("word")
      .select(col("word"), Unigram.segmentCol(col("word"), pieces, costs).as("s"))
      .select(col("word"), col("s.cost_bits"), col("s.n_pieces"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("abab") == ((1L, 1L)))
    assert(out("aab") == ((5L, 2L)))
    assert(out("ba") == ((6L, 2L)))
  }

  test("single-char coverage makes every in-contract word segmentable") {
    val out = Unigram.segmentWords(spark, Sf)
    assert(out.filter(col("cost_bits").isNull).count() == 0)
    // a one-piece word costs its piece; n_pieces never exceeds word_len
    assert(out.filter(col("n_pieces") > col("word_len")).count() == 0)
    assert(out.filter(col("n_pieces") < 1).count() == 0)
  }

  test("out-of-contract words null out instead of throwing") {
    val pieces = Array("a")
    val costs = Array(1L)
    val out = Seq("", "a" * (UnigramSegment.MaxWordLen + 1), "zz")
      .toDF("word")
      .select(Unigram.segmentCol(col("word"), pieces, costs).as("s"))
      .select(col("s.cost_bits")).collect().map(r => r.isNullAt(0))
    assert(out.forall(identity), "empty/overlong/uncoverable words must yield nulls")
  }

  test("segmentation is per-row: model applied with no shuffle beyond the word table") {
    val docs = Tables.documents(spark, Sf)
    val (pieces, costs) = Unigram.collectModel(docs)
    val p = Unigram.wordTable(docs)
      .select(Unigram.segmentCol(col("word"), pieces, costs))
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    // exactly the word-table aggregation exchange; the DP adds none
    val hashes = p.sliding("Exchange".length).count(_ == "Exchange")
    assert(hashes <= 1, s"segmentation must not add exchanges:\n$p")
  }
}
