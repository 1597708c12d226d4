package graft

import graft.pipelines.CrawlPipeline

class CrawlPipelineSpec extends SparkSuite {

  test("one row per document survives the whole chain") {
    val n = Tables.documents(spark, Sf).count()
    assert(CrawlPipeline.crawl(spark, Sf).count() == n)
  }

  test("NFC stage is observable: the decomposed plant arrives composed") {
    val r = CrawlPipeline.crawl(spark, Sf).limit(5).collect()
    r.foreach { row =>
      val t = row.getAs[String]("clean_text")
      assert(t.endsWith(" \u1E8Dend"), s"expected composed U+1E8D tail, got ...${t.takeRight(8)}")
      assert(!t.contains("\u0308"), "no combining mark may survive NFC")
    }
  }

  test("canonicalization scrubbed scheme case, www, default ports, tracking, fragments") {
    CrawlPipeline.crawl(spark, Sf).limit(50).collect().foreach { row =>
      val c = row.getAs[String]("canon")
      assert(c.startsWith("http://crawl") || c.startsWith("https://crawl"), c)
      assert(!c.contains("WWW.") && !c.contains(":80") && !c.contains(":443"), c)
      assert(!c.contains("utm_") && !c.contains("#"), c)
    }
  }

  test("plan shape: ONE hash exchange (the dedup fingerprint window), map-only otherwise") {
    val plan = CrawlPipeline.crawl(spark, Sf).queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected exactly one hash exchange, got $hashEx\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "the chain must not join — every stage is a per-row expression")
  }
}
