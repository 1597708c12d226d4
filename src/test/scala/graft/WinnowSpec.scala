package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.plans.WinnowHashes
import graft.dedup.Winnow

class WinnowSpec extends SparkSuite {

  private def sel(s: String, k: Int, w: Int): Set[Long] =
    WinnowHashes.selectedOf(UTF8String.fromString(s), k, w).toSet

  test("selectedOf matches a straightforward reference winnower") {
    // reference: positional hashes, each window's rightmost min, distinct
    def ref(s: String, k: Int, w: Int): Set[Long] = {
      val cps = s.codePoints().toArray
      val m = cps.length - k + 1
      if (m <= 0) return Set.empty
      val kh = (0 until m).map { i =>
        (0 until k).foldLeft(0L)((h, j) => (h * WinnowHashes.B + cps(i + j)) % WinnowHashes.P)
      }
      val ww = math.min(w, m)
      (0 to m - ww).map { s0 =>
        val win = kh.slice(s0, s0 + ww)
        val minV = win.min
        kh(s0 + win.lastIndexOf(minV))
      }.toSet
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val s = (1 to (5 + rnd.nextInt(60))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      assert(sel(s, 5, 4) == ref(s, 5, 4), s"mismatch on '$s'")
    }
  }

  test("winnowing guarantee: shared run of k+w-1 chars implies a shared fingerprint") {
    val k = WinnowHashes.DefaultK
    val w = WinnowHashes.DefaultW
    val shared = "x" * 0 + "the quick brown fox jumps!" // 26 chars > k+w-1 = 23
    assert(shared.length >= k + w - 1)
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 20) {
      def noise(n: Int) = (1 to n).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
      val a = noise(30 + rnd.nextInt(40)) + shared + noise(rnd.nextInt(40))
      val b = noise(rnd.nextInt(50)) + shared + noise(30 + rnd.nextInt(30))
      val inter = sel(a, k, w).intersect(sel(b, k, w))
      assert(inter.nonEmpty, s"trial $trial: no shared fingerprint despite a $shared run")
    }
  }

  test("degenerate inputs: shorter than k is empty, k-gram count below w still selects") {
    assert(sel("abc", 16, 8).isEmpty)
    val s = "abcdefghijklmnopq" // 17 chars -> m=2 kgrams < w
    assert(sel(s, 16, 8).size == 1, "one window over all kgrams selects exactly its min")
  }

  test("sharedPairs finds planted shared runs and respects the ubiquity cap") {
    import spark.implicits._
    val run = "this exact licensed paragraph appears in multiple docs verbatim"
    def soup(seed: Int, n: Int) = {
      val r = new scala.util.Random(seed)
      (1 to n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    (Seq(
      (1L, soup(1, 80) + run + soup(2, 60)),
      (2L, soup(3, 50) + run + soup(4, 90)),
      (3L, soup(5, 120)),
      (4L, soup(6, 140))
    ).toDF("doc_id", "text"))
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Winnow.sharedPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"expected exactly the planted (1,2) pair, got ${pairs.toSeq}")
    assert(pairs.head._3 >= Winnow.MinShared)
  }

  test("exact-copy collapse: copies neither inflate the ubiquity cap nor vanish from the report") {
    import spark.implicits._
    def soup(seed: Int, n: Int) = {
      val r = new scala.util.Random(seed)
      (1 to n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val baseA = soup(11, 260)                 // unique content A
    val docB = baseA.take(200) + soup(12, 90) // shares a 200-char run with A
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow-cp").toString
    // doc 1 = A, docs 100-108 = NINE byte-identical copies of A, doc 2 = B.
    // Raw-doc rarity would see A's fingerprints in 10-11 docs > cap 8 and
    // silently drop every pair; collapsed rarity counts distinct contents
    // (2), keeping the report intact.
    val rows = Seq(1L -> baseA, 2L -> docB) ++ (100L to 108L).map(_ -> baseA)
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = Winnow.sharedPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val copyIds = Seq(1L) ++ (100L to 108L)
    // every copy pair reported (45 intra pairs), all with the same count
    val intraExpected = (for {
      a <- copyIds; b <- copyIds if a < b
    } yield (a, b)).toSet
    assert(intraExpected.subsetOf(pairs.keySet),
      s"missing copy pairs: ${(intraExpected -- pairs.keySet).take(5)}")
    assert(intraExpected.map(pairs).size == 1, "intra-group counts must be identical")
    // the cross-content (A, B) pair survives for EVERY copy of A
    copyIds.foreach { a =>
      val key = if (a < 2L) (a, 2L) else (2L, a)
      assert(pairs.contains(key), s"copy $a lost its pair with B")
    }
    // the naive uncollapsed rarity (over raw docs) caps away every
    // SHARED fingerprint (each appears in 10-11 raw docs), so the naive
    // pair join reports NOTHING — the hazard the collapse prevents
    val fps = Winnow.fingerprints(spark, dir)
    val rareNaive = fps.groupBy(col("fp")).agg(count(lit(1)).as("n"))
      .filter(col("n") <= Winnow.MaxDocsPerFp).select("fp")
    val keptNaive = fps.join(rareNaive, "fp")
    val naivePairs = keptNaive.as("a").join(keptNaive.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id")).count()
    assert(naivePairs == 0L,
      "test premise: raw-doc rarity must lose every shared fingerprint here")
  }

  test("pair-expansion cap: a viral copy group reports in cluster form, never O(g²) pairs") {
    import spark.implicits._
    def soup(seed: Int, n: Int) = {
      val r = new scala.util.Random(seed)
      (1 to n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val viral = soup(21, 300)  // one content, copied far past MaxExpandGroup
    val other = soup(22, 250)  // a small copy group, within the cap
    val cross = viral.take(220) + soup(23, 80) // shares a run with viral
    val viralN = Winnow.MaxExpandGroup + 6
    val rows =
      (1000L until 1000L + viralN).map(_ -> viral) ++
        Seq(1L -> other, 2L -> other, 3L -> other) ++
        Seq(5L -> cross)
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow-cap").toString
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = Winnow.sharedPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the viral group (g = cap+6) must contribute NO member pairs at all —
    // neither its (cap+6 choose 2) intra pairs nor cross pairs with doc 5
    assert(!pairs.exists { case (a, b) => a >= 1000L || b >= 1000L },
      s"viral group leaked into the pair report: ${pairs.filter(p => p._1 >= 1000L || p._2 >= 1000L).take(5)}")
    // the small copy group still pair-expands normally
    assert(Set((1L, 2L), (1L, 3L), (2L, 3L)).subsetOf(pairs),
      s"small group lost its intra pairs: $pairs")

    // the linear report carries the viral group in full: one row per member
    val clusters = Winnow.sharedClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viralRows = clusters.filter(_._1 == 1000L)
    assert(viralRows.length == viralN, s"expected $viralN viral members, got ${viralRows.length}")
    assert(viralRows.map(_._3).distinct.length == 1, "one shared count describes the whole group")
    assert(clusters.count(_._1 == 1L) == 3, "small group present in cluster form too")
    // rep-level relation keeps the withheld cross link visible (linear form)
    val repPairs = Winnow.repSharedPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(repPairs.contains((5L, 1000L)),
      s"rep-level pair (5, 1000) must survive the cap: $repPairs")

    // bounded growth, the X36 probe methodology: 10× more copies of the
    // viral content must grow the PAIR report not at all and the cluster
    // report exactly linearly (+10× the viral membership rows).
    val dir10 = java.nio.file.Files.createTempDirectory("graft-winnow-cap10").toString
    val rows10 =
      (1000L until 1000L + viralN * 10).map(_ -> viral) ++
        Seq(1L -> other, 2L -> other, 3L -> other) ++
        Seq(5L -> cross)
    rows10.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir10/documents.parquet")
    val pairs10 = Winnow.sharedPairs(spark, dir10).count()
    val clusters10 = Winnow.sharedClusters(spark, dir10).count()
    assert(pairs10 == pairs.size.toLong,
      s"pair report must be copy-count-invariant past the cap: ${pairs.size} -> $pairs10")
    assert(clusters10 == clusters.length + viralN * 9L,
      s"cluster report must grow linearly: ${clusters.length} -> $clusters10")
  }
}
