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

  test("isqrt is exactly floor(sqrt(x)) across boundaries and large values") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val xs = (0L to 5000L) ++
      Seq((1L << 40) - 1, 1L << 40, (1L << 40) + 1, (1L << 52) - 1, 1L << 52)
    val got = xs.toDF("x").select(col("x"), graft.ops.Mixing.isqrt(col("x")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      val s = got(x)
      assert(s * s <= x && (s + 1) * (s + 1) > x, s"isqrt($x) = $s")
    }
  }

  test("temperature mix: quotas sum to the budget; the head language's share " +
    "drops below proportional, every tail language's rises above") {
    import org.apache.spark.sql.functions._
    val rep = graft.ops.Mixing.temperatureQuotas(
      graft.Tables.documents(spark, Sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    val budgetTarget = rep.map(_._2).sum / 2
    assert(rep.map(_._3).sum == budgetTarget, "quotas must sum exactly to budget")
    val byAvail = rep.sortBy(-_._2)
    val head = byAvail.head
    assert(head._4 < head._5, s"head lang ${head._1} share must drop: $head")
    byAvail.tail.foreach { l =>
      assert(l._4 > l._5, s"tail lang ${l._1} share must rise: $l")
    }
    // selection respects quotas per language
    val picked = graft.ops.Mixing.mixTemperature(graft.Tables.documents(spark, Sf))
      .groupBy(col("lang")).agg(sum(col("toks")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val quotas = rep.map(r => r._1 -> r._3).toMap
    picked.foreach { case (l, t) => assert(t <= quotas(l), s"$l overshoots") }
  }
}
