package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10x scale experiment: key-offset unions of the sf0.1 fixtures →
  * measure the heavy operators and check for super-linear blowup.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.configure(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val dst = "/tmp/sf1_synth"
    val copies = 10

    def replicate(table: String, keyCols: Map[String, Long]): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val out = (0 until copies).map { i =>
        keyCols.foldLeft(base) { case (df, (c, stride)) =>
          df.withColumn(c, col(c) + lit(i * stride))
        }
      }.reduce(_ unionByName _)
      out.repartition(32).write.mode("overwrite").parquet(s"$dst/$table.parquet")
    }
    // documents: shift doc_id; embeddings: shift vec_id; orders/lineitem/customer/supplier: shift keys consistently
    replicate("documents", Map("doc_id" -> 1000000L))
    replicate("embeddings", Map("vec_id" -> 1000000L))
    replicate("orders", Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L))
    replicate("lineitem", Map("l_orderkey" -> 10000000L, "l_suppkey" -> 1000000L))
    replicate("customer", Map("c_custkey" -> 1000000L))
    replicate("supplier", Map("s_suppkey" -> 1000000L))
    for (t <- Seq("nation", "region", "part"))
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$dst/$t.parquet")
    // events carries TIMESTAMP(NANOS): route through the converting loader
    Tables.events(spark, src).write.mode("overwrite").parquet(s"$dst/events.parquet")

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"SCALE $label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    def fullEval(df: DataFrame): Unit =
      { df.select(org.apache.spark.sql.functions.bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect(); () }

    println(s"rows: docs=${spark.read.parquet(s"$dst/documents.parquet").count()}, lineitem=${spark.read.parquet(s"$dst/lineitem.parquet").count()}")
    val headline = Set("q_dedup_chargram","q_dedup_neardup","q_srdata_flagship","q_preprocess_monthly",
      "q_similarity_topk","q_dedup_simhash","q_distinct_upsert","q_embedding_neardup")
    val wanted: String => Boolean =
      if (args.contains("all")) _ => true else headline.contains
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if wanted(name)) {
      spark.catalog.clearCache()
      time(name)(fullEval(fn(spark, dst)))
    }
    spark.stop()
  }
}
