package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SimpleMode

/** Plan-shape regression guards: the scale properties the scaladocs claim
  * (per-row ops shuffle nothing, small sides broadcast, no sort-merge
  * fallbacks on bounded joins) asserted against the optimized physical
  * plan — so a future refactor that silently turns a broadcast into a
  * sort-merge join, or adds an exchange to a map-only pipeline, fails a
  * unit test instead of a 10× probe.
  */
class PlanShapeSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf).queryExecution.explainString(SimpleMode)

  private def countOf(s: String, needle: String): Int =
    s.sliding(needle.length).count(_ == needle)

  test("per-row operators are exchange-free: mix, split") {
    Seq("q_corpus_mix", "q_corpus_split").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q grew a shuffle:\n$p")
    }
  }

  test("per-row scan pipelines shuffle only the widen round-robin") {
    Seq("q_redact_pii", "q_repetition", "q_token_count", "q_normalize_text",
        "q_fingerprint").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q has a hash exchange — per-row op should not:\n$p")
      assert(!p.contains("Exchange rangepartitioning"),
        s"$q has a range exchange — per-row op should not:\n$p")
    }
  }

  test("heavy hitters: candidate and total joins broadcast, never sort-merge") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"candidate join fell back to sort-merge:\n$p")
  }

  test("hygiene funnel: no sort-merge joins; the only ordered window is the 7-row dim") {
    val p = plan("q_hygiene_funnel")
    assert(!p.contains("SortMergeJoin"), p)
    // the corpus-sized window is partitioned (by fp); a global ordered
    // window over corpus data would show as an un-partitioned Sort before
    // Window with a corpus-side child — the 7-row funnel window is the
    // single allowed global one
    assert(countOf(p, "Window [") <= 3, p)
  }

  test("flagship star join: all dimension joins broadcast") {
    val p = plan("q_srdata_flagship")
    assert(!p.contains("SortMergeJoin"), s"a dim join fell back to sort-merge:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
