package graft

import org.apache.spark.sql.functions._

class GraftFacadeSpec extends SparkSuite {

  test("dedupCorpus drops exactly the greater side of every near-dup pair") {
    val docs = Tables.documents(spark, Sf)
    val kept = Graft.dedupCorpus(docs)
    val pairs = dedup.Dedup.MinHashLSH.nearDupPairs(spark, Sf)
      .select(col("doc_b")).distinct().count()
    assert(kept.count() === docs.count() - pairs)
  }

  test("analyzeCorpus emits one fully-populated row per document") {
    val out = Graft.analyzeCorpus(Tables.documents(spark, Sf)).cache()
    assert(out.count() === Tables.documents(spark, Sf).count())
    assert(out.filter(col("lang_pred").isNull || col("fp_md5").isNull ||
      col("quality_score").isNull).count() === 0)
  }

  test("approximate search stays within the exact search's result universe") {
    val exact = Graft.searchTopK(spark, Sf).select("query_id", "neighbor_id")
    val approx = Graft.searchTopKApprox(spark, Sf).select("query_id", "neighbor_id")
    assert(approx.count() === exact.count(), "both return K per query")
  }
}
