package graft

import org.apache.spark.sql.functions._
import graft.plans.RobotsAllowed
import graft.text.Robots

class RobotsSpec extends SparkSuite {

  private def ok(robots: String, agent: String, path: String): Boolean =
    RobotsAllowed.allowed(robots, agent, path) == 1

  test("longest-prefix wins; ties go to Allow; no match allows") {
    val r = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
    assert(!ok(r, "bot", "/a/x"))
    assert(ok(r, "bot", "/a/b/deep"))
    assert(ok(r, "bot", "/elsewhere"))
    val tie = "User-agent: *\nDisallow: /ab\nAllow: /ab\n"
    assert(ok(tie, "bot", "/abc"), "equal-length rules: Allow wins")
  }

  test("own group eclipses the * group entirely (most-specific-group rule)") {
    val r = "User-agent: *\nDisallow: /\n\nUser-agent: graftbot\nDisallow: /private\n"
    assert(ok(r, "graftbot", "/anything"), "the * Disallow:/ must be IGNORED")
    assert(!ok(r, "graftbot", "/private/x"))
    assert(!ok(r, "otherbot", "/anything"), "others still fall to *")
  }

  test("comments, unknown directives, casing, empty Disallow, blank lines") {
    val r = "# top comment\nUSER-AGENT: GraftBot  # inline\nCrawl-delay: 5\n" +
      "Disallow:\n\nDisallow: /x # comment\n"
    assert(ok(r, "graftbot", "/anything"), "empty Disallow matches nothing")
    assert(!ok(r, "graftbot", "/x/y"),
      "blank lines must NOT end the group (RFC 9309) and casing is insensitive")
  }

  test("consecutive User-agent lines share one rule set") {
    val r = "User-agent: a\nUser-agent: graftbot\nDisallow: /x\n\n" +
      "User-agent: b\nDisallow: /y\n"
    assert(!ok(r, "graftbot", "/x/1"), "second UA of the run owns the rules")
    assert(ok(r, "graftbot", "/y/1"), "the b group's rules do not apply")
    // a UA line AFTER rules starts a NEW group — it must not inherit /x
    val r2 = "User-agent: graftbot\nDisallow: /x\nUser-agent: c\nDisallow: /z\n"
    assert(ok(r2, "c", "/x/1"))
    assert(!ok(r2, "c", "/z/1"))
  }

  test("gated query agrees with a direct reading of the planted rules") {
    val rows = Robots.crawlScreen(spark, Sf).orderBy("doc_id").limit(36).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val hasOwn = id % 3 == 0
      val allowed = r.getAs[Int]("allowed") == 1
      (id % 6) match {
        case 0 => assert(allowed, s"doc $id") // own group has no matching rule OR */pub allow
        case 1 => assert(allowed == hasOwn, s"doc $id") // own group eclipses * deny
        case 2 => assert(allowed == hasOwn, s"doc $id")
        case 3 => assert(allowed == !hasOwn, s"doc $id") // /bot denied only by own group
        case 4 => assert(allowed, s"doc $id")
        case 5 => assert(allowed == hasOwn, s"doc $id")
        case _ =>
      }
    }
  }

  test("plan is map-only") {
    val plan = Robots.crawlScreen(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"))
  }
}
