package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{JsonPaths, WordpieceEncode}

/** Seeded randomized mirrors for the round-12 closing cores — the
  * DecoderFuzzSpec discipline: independent re-implementations checked
  * over generated inputs, fixed seeds so failures replay.
  */
class NewOpsFuzzSpec extends SparkSuite {

  // ---- set-similarity: prefix-filtered join == brute force ----------

  test("setsim: 30 random corpora agree with brute force at two thresholds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new Random(20260816L)
    val vocab = Vector("ape", "bat", "cow", "doe", "elk", "fox", "gnu", "hen")
    def doc(): String = {
      val base = Seq.fill(6 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
      base.mkString(" ")
    }
    def brute(docs: Seq[(Long, String)], tauBp: Int): Set[(Long, Long)] = {
      def set(t: String): Set[String] = {
        val tk = t.split(" ", -1)
        if (tk.length < 3) Set.empty else tk.sliding(3).map(_.mkString(" ")).toSet
      }
      val ss = docs.map { case (i, t) => i -> set(t) }.filter(_._2.nonEmpty)
      (for {
        (a, sa) <- ss; (b, sb) <- ss if a < b
        i = (sa intersect sb).size; u = (sa union sb).size
        if i > 0 && 10000L * i >= tauBp.toLong * u
      } yield (a, b)).toSet
    }
    for (trial <- 1 to 30) {
      val n = 6 + rnd.nextInt(6)
      val base = (0L until n).map(i => i -> doc())
      // splice in duplicates and near-dups so pairs actually occur
      val docs = base ++ Seq(
        (100L + trial, base(0)._2),
        (200L + trial, base(1)._2 + " " + vocab(rnd.nextInt(vocab.size))))
      val df = docs.toDF("doc_id", "text")
      for (tau <- Seq(5000, 8000)) {
        val got = graft.dedup.SetSim.similarityJoin(df, tauBp = tau)
          .select(col("a"), col("b")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == brute(docs, tau), s"trial $trial tau $tau docs $docs")
      }
    }
  }

  // ---- wordpiece: greedy mirror ------------------------------------

  private def mirrorGreedy(word: String, vocab: Set[String]): (Int, String) = {
    if (word.isEmpty || word.length > WordpieceEncode.MaxWordLen) return (1, "[UNK]")
    var p = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (p < word.length) {
      val cands = (1 to math.min(WordpieceEncode.MaxPieceLen, word.length - p))
        .reverse
        .map(l => if (p == 0) word.substring(0, l) else "##" + word.substring(p, p + l))
        .find(vocab.contains)
      cands match {
        case None => return (1, "[UNK]")
        case Some(c) =>
          out += c
          p += (if (p == 0) c.length else c.length - 2)
      }
    }
    (out.size, out.mkString(" "))
  }

  test("wordpiece: 300 random (word, vocab) cases agree with the mirror") {
    val rnd = new Random(777L)
    val alpha = "abcd"
    for (trial <- 1 to 300) {
      val word = Seq.fill(1 + rnd.nextInt(18))(alpha(rnd.nextInt(4))).mkString
      // random vocab: maybe-partial singles + random multi pieces
      val singles = alpha.flatMap { c =>
        if (rnd.nextInt(10) > 0) Seq(c.toString, s"##$c") else Nil
      }
      val multis = Seq.fill(rnd.nextInt(12)) {
        val l = 2 + rnd.nextInt(3)
        val g = Seq.fill(l)(alpha(rnd.nextInt(4))).mkString
        if (rnd.nextBoolean()) g else s"##$g"
      }
      val vocab = (singles ++ multis).distinct
      val arr = new GenericArrayData(vocab.map(UTF8String.fromString).toArray[Any])
      val r = WordpieceEncode.compute(UTF8String.fromString(word),
        WordpieceEncode.buildSet(arr))
      val (en, es) = mirrorGreedy(word, vocab.toSet)
      assert(r.getInt(0) == en && r.getUTF8String(1).toString == es,
        s"trial $trial word $word vocab ${vocab.sorted}")
    }
  }

  // ---- json paths: generator-as-oracle ------------------------------

  private def genJson(rnd: Random, depth: Int, path: String,
      expect: scala.collection.mutable.ArrayBuffer[(String, String)]): String =
    rnd.nextInt(if (depth >= 3) 4 else 6) match {
      case 0 => expect += (path -> "number")
        Seq("0", "-7", "3.25", "1e3", "-2.5E-2")(rnd.nextInt(5))
      case 1 => expect += (path -> "string")
        "\"s" + rnd.nextInt(100) + (if (rnd.nextBoolean()) "\\n" else "") + "\""
      case 2 => expect += (path -> "boolean")
        if (rnd.nextBoolean()) "true" else "false"
      case 3 => expect += (path -> "null"); "null"
      case 4 =>
        expect += (path -> "object")
        val n = rnd.nextInt(3)
        val items = (0 until n).map { i =>
          val k = s"k$i"
          s""""$k": ${genJson(rnd, depth + 1, s"$path.$k", expect)}"""
        }
        items.mkString("{", ", ", "}")
      case _ =>
        expect += (path -> "array")
        val n = rnd.nextInt(3)
        val items = (0 until n).map(_ => genJson(rnd, depth + 1, s"$path[*]", expect))
        items.mkString("[", ", ", "]")
    }

  test("json paths: 300 generated documents match the generator's own path list") {
    val rnd = new Random(4242L)
    for (trial <- 1 to 300) {
      val expect = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val js = genJson(rnd, 0, "$", expect)
      val arr = JsonPaths.parse(UTF8String.fromString(js))
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
      }
      assert(got == expect.toSeq, s"trial $trial json $js")
    }
  }
}
