package graft

import org.apache.spark.sql.functions._
import graft.pipelines.SqlToParquet

class SqlToParquetSpec extends SparkSuite {

  test("end-to-end: query -> DDL -> keyed sink lands one row per incident, idempotently") {
    val base = java.nio.file.Files.createTempDirectory("graft-etl").toString
    val n = SqlToParquet.run(spark, Sf, base)
    assert(n > 0)
    val stored = spark.read.parquet(s"$base/${SqlToParquet.IndexName}")
    assert(stored.groupBy(SqlToParquet.Key).count().filter(col("count") > 1).count() === 0,
      "doc-id semantics: at most one row per key")
    val firstRun = stored.collect().toSet
    SqlToParquet.run(spark, Sf, base) // re-run = same table (bulk-index idempotency)
    val secondRun = spark.read.parquet(s"$base/${SqlToParquet.IndexName}").collect().toSet
    assert(firstRun === secondRun)
  }

  test("keyword columns are sink-normalized (lowercase)") {
    val df = SqlToParquet.shaped(spark, Sf).select("Assignee", "Client_Mnemonic").limit(50)
    df.collect().foreach { r =>
      Seq(r.getString(0), r.getString(1)).filter(_ != null).foreach { v =>
        assert(v == v.toLowerCase, s"keyword column value not normalized: $v")
      }
    }
  }
}
