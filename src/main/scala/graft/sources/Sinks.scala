package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sink surface — the reference's Elasticsearch writes re-expressed as
  * parquet-table semantics (zero-egress environment; SURVEY §2.1 S3-S6).
  *
  *   - S4 [[writeKeyed]] ↔ ES bulk index with `es.mapping.id`
  *     (`sql_to_es_etl.py:137-142`): doc-id semantics = at most one row per
  *     key; the write dedups by key first, so a re-run lands the identical
  *     table (bulk-index idempotency).
  *   - S5 [[mergeByKey]] / [[writeMerged]] ↔ ES upsert + `mode("append")`
  *     (`snowflake_to_es_etl.py:234-241`): new batch merged into the
  *     existing table, last writer (by version column) wins per key.
  *   - S6 [[SchemaRegistry]] ↔ the typed index mapping + existence check +
  *     `init()` (`sql_to_es_etl.py:98-134`, `snowflake_to_es_etl.py:107-225`).
  *
  * Scale notes: both sinks are one window over a hash partition by key —
  * no global ordering, no driver data path. The merge reads the existing
  * table once; at 100 TB you'd bound that with partition pruning on the
  * sink's bucket column (see Preprocess.writeMonthPartitioned) — the merge
  * here composes with it (merge within each month partition).
  */
object Sinks {

  /** Keep one row per key: smallest-version-last semantics are supplied by
    * `orderBy`; ties broken by every remaining column for determinism.
    */
  private def keepOne(df: DataFrame, key: String, versionDesc: String): DataFrame = {
    val tieBreak = df.columns.filterNot(c => c == key || c == versionDesc).sorted.map(asc)
    val w = Window.partitionBy(col(key)).orderBy(desc(versionDesc) +: tieBreak.toSeq: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** S4: keyed sink. Idempotent by construction — whatever the input's
    * duplication, the stored table has exactly one row per key.
    */
  def writeKeyed(df: DataFrame, key: String, version: String, path: String): Unit =
    keepOne(df, key, version).write.mode("overwrite").parquet(path)

  /** S5 merge step: existing ∪ updates, last writer per key wins.
    * `unionByName` aligns schemas by name (U1); updates win ties via the
    * `is_update` flag ranking above existing rows at equal version.
    */
  def mergeByKey(existing: DataFrame, updates: DataFrame, key: String, version: String): DataFrame = {
    val tagged = existing.withColumn("__upd", lit(0))
      .unionByName(updates.withColumn("__upd", lit(1)))
    val others = tagged.columns.filterNot(c => c == key || c == version || c == "__upd").sorted.map(asc)
    val w = Window.partitionBy(col(key)).orderBy(desc(version) +: desc("__upd") +: others.toSeq: _*)
    tagged.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn", "__upd")
  }

  /** S5 sink: merge updates into the table at `path` (reads existing if
    * present, plain write otherwise) — the ES `upsert`+append write.
    */
  def writeMerged(spark: SparkSession, updates: DataFrame, key: String, version: String,
                  path: String): Unit = {
    val merged =
      if (new java.io.File(path).exists()) {
        val existing = spark.read.parquet(path)
        mergeByKey(existing, updates, key, version)
      } else keepOne(updates, key, version)
    // overwrite of a source being read: materialize through a temp dir
    val tmp = path + "__staging"
    merged.write.mode("overwrite").parquet(tmp)
    val out = spark.read.parquet(tmp)
    out.write.mode("overwrite").parquet(path)
    deleteRecursively(java.nio.file.Paths.get(tmp))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
  }

  /** S6: schema registry — named StructType schemas with ensure-exists DDL,
    * mirroring the ES typed mapping (Keyword/Text/Date/Integer/Boolean/
    * DenseVector) + `indices.exists`/`init()` driver flow. DenseVector
    * becomes `ArrayType(FloatType)` (SURVEY §1 type table).
    */
  object SchemaRegistry {

    /** ↔ the sr-data index mapping (`sql_to_es_etl.py:98-131`): keyword
      * and text fields → string, Date → timestamp, Integer → int,
      * Boolean → boolean, DenseVector(dims=500) → array<float>.
      */
    val SrDataIndex: StructType = new StructType()
      .add("incident_number", StringType, nullable = false) // Keyword, doc id
      .add("summary", StringType)                           // Text(analyzer=english)
      .add("description", StringType)                       // Text
      .add("status", StringType)                            // Keyword (normalized)
      .add("open_date", TimestampType)                      // Date multi-format
      .add("close_date", TimestampType)
      .add("tat", IntegerType)                              // Integer
      .add("is_federal", BooleanType)                       // Boolean
      .add("summary_vector", ArrayType(FloatType))          // DenseVector dims=500

    private val schemas = scala.collection.concurrent.TrieMap[String, StructType](
      "sr_data_index" -> SrDataIndex)

    def register(name: String, schema: StructType): Unit = schemas.put(name, schema)
    def lookup(name: String): Option[StructType] = schemas.get(name)

    /** ↔ `if not es.indices.exists: Index.init()` — create the managed
      * table location with an empty, schema-bearing parquet if absent.
      */
    def ensureExists(spark: SparkSession, name: String, basePath: String): Boolean = {
      val path = s"$basePath/$name"
      val schema = schemas.getOrElse(name,
        throw new IllegalArgumentException(s"unregistered schema: $name"))
      if (new java.io.File(path).exists()) false
      else {
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          .write.parquet(path)
        true
      }
    }
  }
}
