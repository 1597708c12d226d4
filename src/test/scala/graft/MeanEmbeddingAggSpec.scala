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
