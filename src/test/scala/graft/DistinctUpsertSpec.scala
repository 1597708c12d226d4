package graft

import org.apache.spark.sql.functions._
import graft.pipelines.DistinctUpsert

class DistinctUpsertSpec extends SparkSuite {

  test("upsertByKey keeps exactly one row per key — the greatest last_modified") {
    import spark.implicits._
    val df = Seq(
      ("42", "F", "3-MEDIUM", "1997-01-01", "10", null: String, null: String, "Remedy"),
      ("42", "O", "2-HIGH", "1998-06-30", "0", null: String, null: String, "Remedy"),
      ("7", "F", "3-MEDIUM", "1995-05-05", "99", null: String, null: String, "Remedy")
    ).toDF(DistinctUpsert.OutCols: _*)
    val out = DistinctUpsert.upsertByKey(df).collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out === Map("42" -> "1998-06-30", "7" -> "1995-05-05"))
  }

  test("distinct source dedups full rows and carries NULL-literal + string-literal columns") {
    val src = DistinctUpsert.distinctSource(spark, Sf)
    assert(src.count() === src.distinct().count())
    val r = src.limit(1).collect()(0)
    assert(r.isNullAt(r.fieldIndex("row_id")) && r.isNullAt(r.fieldIndex("src_system")))
    assert(r.getString(r.fieldIndex("data_source")) == "Remedy")
  }

  test("cast-all-to-string really makes every column string-typed") {
    val df = DistinctUpsert.shaped(spark, Sf)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("upsert output is unique per key and smaller than its input") {
    val shaped = DistinctUpsert.shaped(spark, Sf)
    val out = DistinctUpsert.distinctUpsert(spark, Sf)
    assert(out.count() < shaped.count())
    assert(out.groupBy("incident_number").count().filter(col("count") > 1).count() === 0)
  }

  test("repartition / getNumPartitions / printSchema plumbing surface (C3-C5)") {
    val df = DistinctUpsert.distinctUpsert(spark, Sf)
    val re = df.repartition(8) // C3 ↔ snowflake_to_es_etl.py:232 repartition(60)
    assert(re.rdd.getNumPartitions === 8) // C4 ↔ :231
    df.printSchema() // C5 ↔ sql_to_es_etl.py:95 (smoke: must not throw)
  }
}
