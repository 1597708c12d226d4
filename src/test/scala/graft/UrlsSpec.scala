package graft

import org.apache.spark.sql.functions._
import graft.text.Urls

class UrlsSpec extends SparkSuite {

  test("PSL resolution: longest suffix wins, host-is-suffix is NULL, unknown TLD falls back") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-urls").toString
    val cases = Seq(
      // (doc_id, planted host, expected registrable domain)
      (1L, "https://a.b.example.com/x", "example.com"),        // 1-label suffix
      (2L, "https://www.site.co.uk/y", "site.co.uk"),          // 2-label suffix beats .uk
      (3L, "https://bucket.s3.amazonaws.com/z", "bucket.s3.amazonaws.com"), // 3-label suffix
      (4L, "https://co.uk", null),                             // host IS a public suffix
      (5L, "https://deep.sub.host.weirdtld/q", "host.weirdtld"), // unknown TLD: 2-label fallback
      (6L, "https://localhost", "localhost"),                  // single unknown label
      (7L, "https://user.github.io/repo", "user.github.io"),   // private-registry entry
      // 4-label suffixes (regional object stores): the deepest join tier
      (8L, "https://acct.blob.core.windows.net/c", "acct.blob.core.windows.net"),
      (9L, "https://blob.core.windows.net", null)               // host IS the 4-label suffix
    )
    // bypass plantUrls: feed the resolver directly through extracted()'s
    // text channel by planting each case's URL as the document text —
    // plantUrls appends its own URLs, so assert on OUR url rows only.
    cases.map { case (id, url, _) => (id, s"ref $url end") }
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Urls.extracted(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(3))))
    cases.foreach { case (id, url, want) =>
      val mine = got.filter(g => g._1 == id && g._2 == url.stripPrefix("ref ").trim)
      assert(mine.length == 1, s"doc $id: expected one row for $url, got ${mine.toSeq}")
      assert(mine.head._3 == Option(want),
        s"doc $id ($url): domain = ${mine.head._3}, want ${Option(want)}")
    }
  }

  test("PSL fixture shape: hundreds of entries, all sections, no dups") {
    import graft.text.PublicSuffixes
    assert(Urls.PublicSuffixList.size >= 500,
      s"fixture shrank to ${Urls.PublicSuffixList.size} entries")
    assert(Urls.PublicSuffixList.distinct.size == Urls.PublicSuffixList.size)
    // every ccTLD of the second-level entries must itself be present —
    // otherwise the fallback tier would misresolve hosts under it
    PublicSuffixes.SecondLevel.foreach { s =>
      val tld = s.substring(s.lastIndexOf('.') + 1)
      assert(PublicSuffixes.TopLevel.contains(tld), s"missing TLD '$tld' for '$s'")
    }
    // registry second-levels resolve one label deeper than their TLD
    Seq("co.uk", "com.au", "co.jp", "com.br", "github.io").foreach { s =>
      assert(Urls.PublicSuffixList.contains(s), s"fixture must carry $s")
    }
  }

  test("resolution joins are broadcast — no shuffle beyond the deliberate widen") {
    val plan = Urls.extracted(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "PSL joins must broadcast")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ in:\n$plan")
  }
}
