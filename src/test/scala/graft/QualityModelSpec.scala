package graft

import org.apache.spark.sql.functions._
import graft.text.QualityModel

class QualityModelSpec extends SparkSuite {

  test("classifier scores every tokenized document exactly once") {
    val out = QualityModel.score(spark, Sf).cache()
    val docs = Tables.documents(spark, Sf).count()
    assert(out.count() === docs, "fixture docs all tokenize non-empty")
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() === 0)
  }

  test("the gate exercises both verdicts (threshold sits mid-range)") {
    val out = QualityModel.score(spark, Sf)
    val kept = out.filter(col("keep")).count()
    val dropped = out.filter(!col("keep")).count()
    assert(kept > 0, "no document kept — threshold too high for the fixture weights")
    assert(dropped > 0, "no document dropped — threshold too low for the fixture weights")
  }

  test("score is the exact integer mean: sum_w and n_toks reproduce score_q") {
    val bad = QualityModel.score(spark, Sf)
      .filter(col("score_q") =!=
        expr("(1000 * sum_w - pmod(1000 * sum_w, n_toks)) DIV n_toks"))
    assert(bad.count() === 0)
  }

  test("weight table broadcasts; token stream never shuffles to meet it") {
    val plan = QualityModel.score(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"weights must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"token stream must not shuffle to the join:\n$plan")
  }

  test("streaming filter verdict equals the batch gate's, per document") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val model = QualityModel.collectWeights(spark, Sf)
    val batch = QualityModel.score(spark, Sf)
      .select("doc_id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = QualityModel.filterStream(mem.toDF().toDF("doc_id", "text"), model)
    val q = out.writeStream.format("memory").queryName("qm_stream")
      .outputMode("append").start()
    mem.addData(docs.take(60).toSeq: _*)
    mem.addData((9999L, "the of and to in")) // stopwords only: no tokens, dropped
    q.processAllAvailable()
    q.stop()
    val kept = spark.sql("SELECT doc_id FROM qm_stream").collect().map(_.getLong(0)).toSet
    val expect = docs.take(60).collect { case (id, _) if batch.getOrElse(id, false) => id }.toSet
    assert(kept === expect)
  }

  test("weights are deterministic across evaluations") {
    val a = QualityModel.weights(spark, Sf).orderBy("slot").collect().toSeq
    val b = QualityModel.weights(spark, Sf).orderBy("slot").collect().toSeq
    assert(a === b)
  }
}
