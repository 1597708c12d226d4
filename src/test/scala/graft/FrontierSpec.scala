package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Frontier

class FrontierSpec extends SparkSuite {

  test("bloom path is BIT-IDENTICAL to the exact anti join") {
    val exact = Frontier.newUrls(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val bloom = Frontier.newUrlsBloom(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(exact == bloom)
    assert(exact.nonEmpty, "fixture must yield some genuinely-new URLs")
  }

  test("no yesterday key survives; every admitted key is genuinely unseen") {
    val seen = Frontier.urlKeys(spark, Sf).filter(col("doc_id") % 2 === 0)
      .select("url_key").collect().map(_.getString(0)).toSet
    val admitted = Frontier.newUrls(spark, Sf).collect()
    admitted.foreach { r =>
      assert(r.getLong(0) % 2 == 1, "only today's (odd) docs may be admitted")
      assert(!seen.contains(r.getString(1)), s"seen key admitted: ${r.getString(1)}")
    }
    // and the filter actually bites: some odd doc's key WAS seen
    val odd = Frontier.urlKeys(spark, Sf).filter(col("doc_id") % 2 === 1).count()
    assert(admitted.length < odd, "overlap must exist for the filter to matter")
  }

  test("bloom plan: might_contain prefilter present, sketch is a literal") {
    val plan = Frontier.newUrlsBloom(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "map-side Bloom reject must appear")
    assert(plan.contains("Union"), "definitely-new bypasses the verify join")
  }
}
