package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.plans.WordpieceEncode

class WordpieceSpec extends SparkSuite {

  private def enc(word: String, vocab: Seq[String]): (Int, String) = {
    val arr = new GenericArrayData(vocab.map(UTF8String.fromString).toArray[Any])
    val r = WordpieceEncode.compute(UTF8String.fromString(word),
      WordpieceEncode.buildSet(arr))
    (r.getInt(0), r.getUTF8String(1).toString)
  }

  private val singles =
    "abcdefgh".map(_.toString) ++ "abcdefgh".map(c => s"##$c")

  test("longest match wins at every position; continuation pieces carry ##") {
    val v = singles ++ Seq("ab", "abc", "##c", "##bc", "##cd")
    assert(enc("abc", v) == (1, "abc"))
    assert(enc("abcd", v) == (2, "abc ##d"))
    assert(enc("aabc", v) == (3, "a ##a ##bc"))
  }

  test("greedy is longest-FIRST, not fewest-pieces") {
    // optimal would be "ab ##cde" (2); greedy grabs "abcd" then needs ##e
    val v = singles ++ Seq("ab", "abcd", "##cde")
    assert(enc("abcde", v) == (2, "abcd ##e"))
    // and when the greedy grab strands the tail, singles rescue it
    val v2 = singles ++ Seq("abcd", "##cde")
    assert(enc("abcde", v2) == (2, "abcd ##e"))
  }

  test("UNK: uncovered position, empty word, and over-length words") {
    assert(enc("axz", singles.filterNot(_.contains("x"))) == (1, "[UNK]"))
    assert(enc("", singles) == (1, "[UNK]"))
    assert(enc("a" * 17, singles) == (1, "[UNK]"))
    assert(enc("a" * 16, singles) == (16, ("a" +: Seq.fill(15)("##a")).mkString(" ")))
  }

  test("corpus-derived vocab keeps all single chars in both roles") {
    import spark.implicits._
    val docs = Seq((1L, "hello hello hello world world xq"))
      .toDF("doc_id", "text")
    val vocab = graft.text.Wordpiece.collectVocab(docs).toSet
    // frequent words contribute multi-char pieces (weight 3 >= MinCount):
    // prefixes of 'hello' in the start role, inner grams in continuation
    assert(vocab.contains("he") && vocab.contains("hell"))
    assert(vocab.contains("##ell") && vocab.contains("##llo"))
    for (c <- "helowrdxq".map(_.toString))
      assert(vocab.contains(c) && vocab.contains(s"##$c"), s"char $c total in both roles")
    assert(!vocab.exists(p => p.replace("##", "").length > 4))
    // rare bigram 'xq' (weight 1 < 3) must NOT be a piece
    assert(!vocab.contains("xq"))
  }

  test("fixture encode round-trips: stripping ## rebuilds every word") {
    import org.apache.spark.sql.functions._
    val out = graft.text.Wordpiece.encodeWords(
      Tables.documents(spark, Sf).select(col("doc_id"), col("text")))
    val bad = out.filter(col("encoded") =!= "[UNK]")
      .filter(regexp_replace(regexp_replace(col("encoded"), " ##", ""), " ", "")
        =!= col("word")).count()
    assert(bad == 0L)
    assert(out.filter(col("encoded") === "[UNK]").count() == 0L,
      "in-contract fixture words are fully covered (single-char totality)")
  }
}
