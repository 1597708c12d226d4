package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class ShingleHashesSpec extends SparkSuite {

  test("fused expression equals the composable chain as a SET, on every fixture doc") {
    val docs = Tables.documents(spark, Sf)
    val both = docs.select(
      array_sort(Dedup.MinHashLSH.shingleHashes(col("text"))).as("fused"),
      array_sort(array_distinct(
        Dedup.MinHashLSH.baseHashes(Dedup.shingles(col("text"))))).as("chain"))
    assert(both.filter(col("fused") =!= col("chain")).count() === 0)
  }

  test("edge semantics match the chain: empty, blank, short, and space-padded inputs") {
    import spark.implicits._
    val df = Seq("", "   ", "one two", "one two three",
      "  leading and trailing spaces  ", "tab\tand\nnewline separated words here")
      .toDF("text")
    val both = df.select(
      array_sort(Dedup.MinHashLSH.shingleHashes(col("text"))).as("fused"),
      array_sort(array_distinct(
        Dedup.MinHashLSH.baseHashes(Dedup.shingles(col("text"))))).as("chain"))
    assert(both.filter(col("fused") =!= col("chain")).count() === 0)
  }
}
