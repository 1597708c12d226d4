package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders. Every query receives a scale-factor directory
  * (e.g. /root/testdata/sf0.01) holding one parquet file per table; Spark's
  * vectorized parquet reader + Catalyst column pruning / filter pushdown do
  * the heavy lifting, so loaders stay bare `spark.read.parquet`.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. With `spark.sql.legacy.parquet.nanosAsLong`
    * (set once at session construction by [[Graft.configure]] and every
    * entry-point builder — a loader must not mutate session conf) the
    * column arrives as raw INT64 nanos; truncate to microseconds with
    * integral division — the same floor DuckDB applies when it narrows
    * nanos to its micro TIMESTAMP, so both engines see identical values.
    * (ts / 1000 in double would corrupt: 1.7e18 nanos exceeds 2^53.)
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events requires spark.sql.legacy.parquet.nanosAsLong=true at session build " +
        "(use Graft.session() or Graft.configure(builder))")
    val raw = table(spark, dir, "events")
    // normalize ts to session-local TIMESTAMP whatever the file carries:
    //   - TIMESTAMP(NANOS) files arrive as raw INT64 nanos (nanosAsLong);
    //     truncate to micros with integral division — the same floor
    //     DuckDB applies (ts / 1000 in double would corrupt: 1.7e18
    //     nanos exceeds 2^53)
    //   - plain micro files without isAdjustedToUTC infer as
    //     TIMESTAMP_NTZ; the session timezone is pinned UTC (asserted by
    //     Graft.configure), so the cast maps wall-clock to the same
    //     instant DuckDB's naive TIMESTAMP arithmetic assumes
    //   - re-written event tables (e.g. ScaleProbe's synthetic copies)
    //     already carry micro TIMESTAMP and pass through unchanged
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
