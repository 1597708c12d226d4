package graft

import org.apache.spark.sql.functions._

/** Source-format round trips: the engine's tables are parquet-first, but
  * the read surface (SURVEY §2.1 S1/S2 note: "parquet/orc/csv/json/jdbc
  * sources") must hold values across formats a reference user might land
  * data in. Each trip writes the documents table and reads it back
  * value-identical.
  */
class SourceFormatsSpec extends SparkSuite {

  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft-fmt").toString

  private lazy val docs = Tables.documents(spark, Sf)
    .select("doc_id", "text", "lang", "source", "n_chars")

  test("ORC round trip preserves schema and values") {
    val p = tmp() + "/docs.orc"
    docs.write.orc(p)
    val back = spark.read.orc(p)
    assert(back.schema == docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("JSON round trip preserves values (schema re-supplied, as JSON is untyped)") {
    val p = tmp() + "/docs.json"
    docs.write.json(p)
    val back = spark.read.schema(docs.schema).json(p)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("CSV round trip with header + explicit schema preserves values") {
    val p = tmp() + "/docs.csv"
    // free text contains no quotes/newlines in the fixture, but escape anyway
    docs.write.option("header", "true").option("escape", "\"").csv(p)
    val back = spark.read.option("header", "true").option("escape", "\"")
      .schema(docs.schema).csv(p)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}
