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

  test("top-k per group plans the WindowGroupLimit pushdown") {
    // row_number ≤ k must become a per-task k-heap BEFORE the exchange —
    // the shuffle then carries ≤ k rows per (group, partition), not the
    // whole table
    val p = plan("q_topk_per_group")
    assert(p.contains("WindowGroupLimit"),
      s"rank-limit pushdown missing — full per-group sort would ship every row:\n$p")
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

  test("scalar-subquery family: the aggregated view's shuffle is computed once (ReusedExchange)") {
    // Q15/Q11/Q2 shapes derive a one-row (or per-group) scalar FROM the
    // same aggregated view they filter — at 100 TB the view's fact
    // shuffle must not run twice. AQE's ReuseExchange fires only when
    // both branches canonicalize equal (q15 pins an explicit isNotNull
    // for exactly this; see Relational.q15TopSupplier).
    Seq("q15_top_supplier", "q11_important_parts", "q2_min_cost_supplier").foreach { q =>
      val df = SparkEntry.queries(q)(spark, Sf)
      df.collect() // reuse is an AQE runtime decision — inspect the executed plan
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"), s"$q recomputes its aggregated view:\n$p")
    }
  }

  test("q19 OR-of-ANDs: equi key extracted (no nested loop), brand superset prunes the part scan") {
    val p = plan("q19_disjunctive_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the disjunction hid the p_partkey = l_partkey equi key:\n$p")
    // each brand literal must appear at least twice: once in the residual
    // join condition, once in the pushed-down part-scan filter (the
    // superset Catalyst extracts from the disjunction)
    Seq("Brand#12", "Brand#23", "Brand#34").foreach { b =>
      assert(countOf(p, b) >= 2, s"$b not pushed into the part scan:\n$p")
    }
  }

  test("q16: exclusion list is a broadcast anti join; distinct count is distributed two-phase") {
    val p = plan("q16_supplier_counts")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial_count(distinct"),
      s"distinct aggregate did not plan as a distributed partial:\n$p")
  }

  test("q17 correlated scalar: part dim broadcast, no cartesian, fact shuffles only on l_partkey") {
    val p = plan("q17_small_qty_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q6 pure scan: all three predicates pushed to parquet, no join, one exchange") {
    val p = plan("q6_forecast_revenue")
    assert(!p.contains("Join"), p)
    assert(countOf(p, "Exchange") == 1, s"q6 should shuffle once (final agg):\n$p")
    // the explain string truncates the PushedFilters list, so pin the
    // scan-adjacent Filter predicates (which imply the pushdown set) and
    // the head of the pushed list
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    Seq("< 24.0)", ">= 0.05)", "< 1998-01-01").foreach { f =>
      assert(p.contains(f), s"predicate missing at the scan: $f\n$p")
    }
  }

  test("q8 widest join tree: every dimension broadcast, exactly one fact-fact shuffle pair") {
    val p = plan("q8_market_share")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // fact-fact joins (lineitem-orders, orders-customer) may legitimately
    // shuffle; every dim (part, supplier, nation x2, region-filtered set)
    // must broadcast
    assert(countOf(p, "BroadcastHashJoin") >= 4, s"a dim join lost its broadcast:\n$p")
  }

  test("flagship star join: all dimension joins broadcast") {
    val p = plan("q_srdata_flagship")
    assert(!p.contains("SortMergeJoin"), s"a dim join fell back to sort-merge:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
