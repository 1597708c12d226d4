package graft.sim

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

import graft.Tables

/** Typed-API twin of [[Similarity.meanEmbedding]] (SURVEY §2.8: the one
  * `Aggregator` the engine ships): a `Dataset[EmbeddingRow]` custom
  * aggregation computing the per-group mean vector in one pass.
  *
  * Same exactness discipline as the untyped plan: elements are quantized
  * to floor(x·1000) longs in `reduce`, so partial buffers merge with
  * integer addition — order-independent, overflow-safe (|q| ≤ ~10⁴, 2⁶³
  * headroom), deterministic under any partitioning. `finish` performs the
  * single double division.
  *
  * Scale shape: buffers are one long[64] per group per partition —
  * map-side partial aggregation, merge cost O(dims), no row explosion.
  * (The posexplode variant trades that for pure-SQL expressibility; both
  * are correct, this one halves the shuffle rows.)
  */
object MeanEmbeddingAgg {

  case class EmbeddingRow(vec_id: Long, embedding: Array[Float], label: Int)
  case class MeanBuffer(sums: Array[Long], n: Long)

  class MeanEmbedding(dims: Int) extends Aggregator[EmbeddingRow, MeanBuffer, Array[Double]] {
    override def zero: MeanBuffer = MeanBuffer(new Array[Long](dims), 0L)

    override def reduce(b: MeanBuffer, row: EmbeddingRow): MeanBuffer = {
      val s = b.sums
      val e = row.embedding
      var i = 0
      while (i < dims && i < e.length) {
        s(i) += math.floor(e(i).toDouble * Similarity.Scale).toLong
        i += 1
      }
      MeanBuffer(s, b.n + 1)
    }

    override def merge(a: MeanBuffer, b: MeanBuffer): MeanBuffer = {
      val out = new Array[Long](dims)
      var i = 0
      while (i < dims) { out(i) = a.sums(i) + b.sums(i); i += 1 }
      MeanBuffer(out, a.n + b.n)
    }

    override def finish(b: MeanBuffer): Array[Double] =
      b.sums.map(_.toDouble / b.n)

    override def bufferEncoder: Encoder[MeanBuffer] = Encoders.product[MeanBuffer]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** label → mean vector over the embeddings fixture, via the typed path:
    * `Dataset[EmbeddingRow].groupByKey(_.label).agg(aggregator)`.
    */
  def meanByLabel(spark: SparkSession, dir: String, dims: Int = 64): Dataset[(Int, Array[Double])] = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "embedding", "label")
      .as[EmbeddingRow]
      .groupByKey(_.label)
      .agg(new MeanEmbedding(dims).toColumn)
  }
}
