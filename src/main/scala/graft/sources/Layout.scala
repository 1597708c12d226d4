package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout control for scan pruning — the table-side half of the
  * predicate-pushdown story. Pushed filters (SURVEY §4) only skip I/O
  * when the FILES are organized so parquet footer min/max statistics are
  * selective: a randomly-laid-out table has every file spanning the whole
  * key domain, and a pushed range predicate still reads 100% of the data.
  *
  * [[writeRangeSorted]] is the fix (the reference writes month-bucketed
  * paths for the same reason, `preprocess_and_store_parquets.py:243-249`;
  * this generalizes to any orderable key):
  *
  *   - `repartitionByRange(n, key)` range-partitions by a sampled key
  *     histogram → files cover DISJOINT key ranges (ties of one key stay
  *     in one file);
  *   - `sortWithinPartitions(key)` orders rows inside each file → parquet
  *     row-group (and page-index) min/max are tight sub-ranges, so
  *     pruning works at row-group granularity too, and downstream
  *     merge/as-of readers see clustered keys.
  *
  * At 100 TB this is the difference between a point-lookup reading one
  * row group and reading the full table; the write costs one range
  * exchange (same price as any shuffle of the data).
  *
  * [[fileRanges]] is the audit: per-file (lo, hi, rows) of the layout
  * key, the evidence that ranges are disjoint and pruning can bite —
  * checked by `LayoutSpec`, the same proof-by-artifact pattern as the
  * plan dumps.
  */
object Layout {

  /** Write `df` as `numFiles` range-partitioned, internally-sorted
    * parquet files under `path`.
    */
  def writeRangeSorted(df: DataFrame, key: String, numFiles: Int, path: String): Unit =
    df.repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Per-file (file, lo, hi, rows) over the layout key — the pruning
    * audit. One scan + one aggregate keyed by file name.
    */
  def fileRanges(spark: SparkSession, path: String, key: String): DataFrame =
    spark.read.parquet(path)
      .select(input_file_name().as("file"), col(key))
      .groupBy(col("file"))
      .agg(min(col(key)).as("lo"), max(col(key)).as("hi"), count(lit(1)).as("rows"))
}
