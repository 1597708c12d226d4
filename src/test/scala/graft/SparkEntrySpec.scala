package graft

/** Contract meta-tests for the driver interface: a query without an oracle
  * silently downgrades to a rows-only check, and an empty result can mask
  * a broken predicate — both are regressions this suite turns loud.
  */
class SparkEntrySpec extends SparkSuite {

  test("every registered query has a matching oracle (and no orphan oracles)") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query returns rows at the smoke scale factor") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (_, fn) =>
      fn(spark, Sf).isEmpty
    }.map(_._1)
    assert(empty.isEmpty, s"queries with empty smoke results: $empty")
  }

  test("query names are unique across module registries (no silent overwrite)") {
    // Map ++ would mask a duplicate key; recompute with collision detection
    val perModule = Seq(
      graft.ops.SrData.queries, graft.ops.Relational.queries,
      graft.text.Analysis.queries, graft.pipelines.Preprocess.queries,
      graft.pipelines.DistinctUpsert.queries, graft.dedup.Dedup.queries,
      graft.sim.Similarity.queries, graft.ops.Events.queries,
      graft.text.Keyword.queries, graft.ops.AsofJoin.queries,
      graft.multimodal.Multimodal.queries)
    val all = perModule.flatMap(_.keys)
    assert(all.size === all.distinct.size, "duplicate query name across modules")
  }
}
