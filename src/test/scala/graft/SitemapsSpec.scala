package graft

import org.apache.spark.sql.functions._
import graft.text.Sitemaps

class SitemapsSpec extends SparkSuite {

  test("urlset entries: loc always, optional lastmod/priority, &amp; decoded") {
    val rows = Sitemaps.extracted(spark, Sf)
      .filter(col("kind") === "url").orderBy("doc_id", "idx").limit(30).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val loc = r.getAs[String]("loc")
      assert(loc.startsWith("https://site") && loc.contains("?a=1&b=2"),
        s"entity must decode in-loc: $loc")
      val idx = r.getAs[Int]("idx")
      if (idx == 1) assert(r.getAs[String]("lastmod") != null, "entry 2 carries lastmod")
      if (idx == 0) assert(r.getAs[String]("lastmod") == null && r.getAs[String]("priority") == null)
      if (idx == 2) assert(r.getAs[String]("priority") == "0.3")
    }
  }

  test("sitemapindex recursion: every fifth doc yields 2 child-sitemap rows, no url rows") {
    val byDoc = Sitemaps.extracted(spark, Sf).filter(col("doc_id") % 5 === 0)
      .groupBy(col("doc_id"), col("kind")).count().collect()
      .map(r => (r.getString(1), r.getLong(2))).groupBy(_._1)
    assert(!byDoc.contains("url"), "index files have no url entries")
    assert(byDoc("sitemap").forall(_._2 == 2L))
    val child = Sitemaps.extracted(spark, Sf)
      .filter(col("kind") === "sitemap").limit(1).collect()(0)
    assert(child.getAs[String]("loc").startsWith("https://maps.example.com/shard"))
  }

  test("plan is map-only: no shuffle beyond the deliberate widen, no join") {
    val plan = Sitemaps.extracted(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("multiline pretty-printing and whitespace inside loc are tolerated") {
    import spark.implicits._
    val xml = "<urlset>\n<url>\n  <loc>\n    https://a/x\n  </loc>\n" +
      "<lastmod>2026-01-02</lastmod>\n</url>\n</urlset>"
    val got = Seq((1L, xml)).toDF("doc_id", "xml")
      .select(col("doc_id"),
        explode(regexp_extract_all(col("xml"), lit(Sitemaps.UrlEntryRe), lit(1))).as("body"))
      .select(regexp_extract(col("body"), Sitemaps.LocRe, 1).as("loc"),
        regexp_extract(col("body"), Sitemaps.LastmodRe, 1).as("lastmod"))
      .collect()(0)
    assert(got.getString(0) == "https://a/x")
    assert(got.getString(1) == "2026-01-02")
  }
}
