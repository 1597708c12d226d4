package graft

import org.apache.spark.sql.functions._
import graft.sources.Sinks

class SinksSpec extends SparkSuite {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-sinks").toString

  test("S4 keyed sink is idempotent: re-running the same write lands the same table") {
    import spark.implicits._
    val df = Seq(
      ("k1", "2020-01-01", "a"), ("k1", "2020-06-01", "b"), ("k2", "2020-01-01", "c")
    ).toDF("id", "ver", "payload")
    val path = tmpDir() + "/keyed"
    Sinks.writeKeyed(df, "id", "ver", path)
    val first = spark.read.parquet(path).collect().toSet
    Sinks.writeKeyed(df, "id", "ver", path)
    val second = spark.read.parquet(path).collect().toSet
    assert(first === second)
    assert(first.map(_.getString(0)) === Set("k1", "k2"))
    assert(first.find(_.getString(0) == "k1").get.getString(2) == "b", "latest version wins")
  }

  test("S5 merge: updates win per key, unmatched existing rows survive") {
    import spark.implicits._
    val existing = Seq(("k1", "2020-01-01", "old"), ("k2", "2020-01-01", "keep"))
      .toDF("id", "ver", "payload")
    val updates = Seq(("k1", "2021-01-01", "new"), ("k3", "2020-05-05", "insert"))
      .toDF("id", "ver", "payload")
    val merged = Sinks.mergeByKey(existing, updates, "id", "ver")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(merged === Map("k1" -> "new", "k2" -> "keep", "k3" -> "insert"))
  }

  test("S5 merge: at equal version the update beats the existing row") {
    import spark.implicits._
    val existing = Seq(("k1", "2020-01-01", "old")).toDF("id", "ver", "payload")
    val updates = Seq(("k1", "2020-01-01", "new")).toDF("id", "ver", "payload")
    val merged = Sinks.mergeByKey(existing, updates, "id", "ver").collect()
    assert(merged.length == 1 && merged(0).getString(2) == "new")
  }

  test("S5 sink round-trip: first write creates, second merges") {
    import spark.implicits._
    val path = tmpDir() + "/merged"
    Sinks.writeMerged(spark,
      Seq(("k1", "2020-01-01", "v1")).toDF("id", "ver", "payload"), "id", "ver", path)
    Sinks.writeMerged(spark,
      Seq(("k1", "2020-02-02", "v2"), ("k2", "2020-01-01", "w1")).toDF("id", "ver", "payload"),
      "id", "ver", path)
    val out = spark.read.parquet(path).collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out === Map("k1" -> "v2", "k2" -> "w1"))
  }

  test("S5 merge fails loudly on schema drift instead of silently dropping columns") {
    import spark.implicits._
    val existing = Seq(("k1", "2020-01-01", "old")).toDF("id", "ver", "payload")
    val drifted = Seq(("k1", "2021-01-01")).toDF("id", "ver") // payload missing
    intercept[org.apache.spark.sql.AnalysisException] {
      Sinks.mergeByKey(existing, drifted, "id", "ver").collect()
    }
  }

  test("S6 registry: ensureExists creates once with the typed schema, then no-ops") {
    val base = tmpDir()
    assert(Sinks.SchemaRegistry.ensureExists(spark, "sr_data_index", base))
    assert(!Sinks.SchemaRegistry.ensureExists(spark, "sr_data_index", base), "second init is a no-op")
    val stored = spark.read.parquet(s"$base/sr_data_index")
    assert(stored.count() === 0)
    assert(stored.schema("summary_vector").dataType.typeName == "array")
    assert(stored.schema("tat").dataType.typeName == "integer")
    intercept[IllegalArgumentException] {
      Sinks.SchemaRegistry.ensureExists(spark, "nope", base)
    }
  }
}
