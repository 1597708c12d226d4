package graft

import org.apache.spark.sql.functions._
import graft.text.{Canonical, Chunker}

class CanonicalChunkSpec extends SparkSuite {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    Canonical.canonicalize(urls.toDF("url")).select("canon")
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalization: case, ports, www, fragments, tracking params, slashes") {
    val out = canon(
      "HTTP://WWW.Example.COM:80/A/B?utm_source=x&b=2&a=1#frag",
      "https://example.com:443/",
      "https://example.com:8080/x/",
      "http://site.org",
      "https://a.net/p?gclid=1&fbclid=2&utm_medium=m",
      "https://a.net/p?z=1&a=2")
    assert(out(0) == "http://example.com/A/B?a=1&b=2") // path case preserved, params sorted
    assert(out(1) == "https://example.com/")           // root slash stays
    assert(out(2) == "https://example.com:8080/x")     // non-default port kept, slash stripped
    assert(out(3) == "http://site.org/")               // empty path -> /
    assert(out(4) == "https://a.net/p")                // all-tracking query vanishes
    assert(out(5) == "https://a.net/p?a=2&z=1")        // sorted
  }

  test("canonical dedup: messy variants of one URL collapse") {
    val variants = canon(
      "http://www.shop.com/item/9?utm_source=mail",
      "HTTP://SHOP.com:80/item/9",
      "http://shop.com/item/9#reviews")
    assert(variants.distinct.size == 1, s"expected one canonical form, got $variants")
  }

  test("chunker: window arithmetic at the boundaries") {
    import spark.implicits._
    val c = Chunker.ChunkTokens; val s = Chunker.Stride
    def tokText(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    // counts: n=0 -> 1 empty chunk; n=C -> 1; n=C+1 -> 2; n=C+S -> 2
    val cases = Seq(0, 1, c, c + 1, c + s, c + s + 1, 3 * s + c)
    cases.foreach { n =>
      val toks = (1 to n).map(i => s"t$i")
      val expChunks = if (n <= c) 1 else (n - c + s - 1) / s + 1
      // drive the REAL pipeline, not a copy of it
      val got = Chunker.chunksOf(Seq((1L, tokText(n))).toDF("doc_id", "text"))
        .orderBy("chunk_id").collect()
      assert(got.length == expChunks, s"n=$n chunk count")
      got.foreach { r =>
        val i = r.getAs[Long]("chunk_id").toInt
        val win = r.getAs[String]("chunk_text").split(" ").filter(_.nonEmpty).toSeq
        assert(win == toks.slice(i * s, i * s + c), s"n=$n chunk $i content")
        assert(r.getAs[Int]("n_toks") == win.length, s"n=$n chunk $i n_toks")
      }
    }
  }

  test("chunk overlap: consecutive windows share C - S tokens") {
    val rows = Chunker.chunks(spark, Sf)
      .filter(col("chunk_id") === 0 || col("chunk_id") === 1)
      .orderBy("doc_id", "chunk_id").limit(20).collect()
      .groupBy(_.getLong(0)).filter(_._2.length == 2)
    assert(rows.nonEmpty, "fixture must have docs long enough for 2 chunks")
    rows.foreach { case (id, Array(c0, c1)) =>
      val t0 = c0.getString(3).split(" ")
      val t1 = c1.getString(3).split(" ")
      val overlap = Chunker.ChunkTokens - Chunker.Stride
      assert(t0.takeRight(overlap).sameElements(t1.take(overlap)),
        s"doc $id: windows must overlap by $overlap tokens")
    }
  }

  test("both plans are map-only: no key shuffle") {
    Seq(Canonical.canonicalUrls(spark, Sf), Chunker.chunks(spark, Sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning"))
      assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
    }
  }
}
