package graft

import org.apache.spark.sql.functions._
import graft.sim.{MeanEmbeddingAgg, Similarity}

class MeanEmbeddingAggSpec extends SparkSuite {

  test("typed Aggregator equals the posexplode plan on every (label, dim)") {
    val typed = MeanEmbeddingAgg.meanByLabel(spark, Sf).collect()
      .map { case (label, means) => label -> means.toSeq }.toMap
    val untyped = Similarity.meanEmbedding(spark, Sf)
      .select("label", "dim", "mean_q").collect()
      .groupBy(_.getInt(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq
      }
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (l, means) =>
      assert(means == untyped(l), s"label $l diverges between typed and untyped plans")
    }
  }

  test("Aggregator registers as a SQL UDAF and matches the typed path") {
    import org.apache.spark.sql.functions
    spark.udf.register("mean_emb", functions.udaf(new MeanEmbeddingAgg.MeanEmbedding(64)))
    Tables.embeddings(spark, Sf)
      .selectExpr("vec_id", "embedding", "label")
      .createOrReplaceTempView("emb_udaf")
    val viaSql = spark.sql(
      "SELECT label, mean_emb(vec_id, embedding, label) AS m FROM emb_udaf GROUP BY label")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    val typed = MeanEmbeddingAgg.meanByLabel(spark, Sf).collect()
      .map { case (l, m) => l -> m.toSeq }.toMap
    assert(viaSql === typed)
  }

  test("HLL sketch: approx_count_distinct lands within 5% of exact on fingerprints") {
    // the cardinality tool for 100 TB dedup-key estimation: one pass, fixed
    // memory, mergeable — exact distinct needs a full shuffle
    val fp = Tables.documents(spark, Sf)
      .select(graft.text.Analysis.fingerprint(col("text")).as("fp"))
    val exact = fp.distinct().count().toDouble
    val approx = fp.agg(approx_count_distinct(col("fp"), 0.02)).collect()(0).getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("aggregator buffers merge associatively across repartitionings") {
    val one = MeanEmbeddingAgg.meanByLabel(spark, Sf).collect()
      .map { case (l, m) => l -> m.toSeq }.toMap
    import spark.implicits._
    val shuffled = graft.Tables.embeddings(spark, Sf)
      .repartition(13)
      .selectExpr("vec_id", "embedding", "label")
      .as[MeanEmbeddingAgg.EmbeddingRow]
      .groupByKey(_.label)
      .agg(new MeanEmbeddingAgg.MeanEmbedding(64).toColumn)
      .collect().map { case (l, m) => l -> m.toSeq }.toMap
    assert(one == shuffled, "integer buffers must be partitioning-invariant")
  }
}
