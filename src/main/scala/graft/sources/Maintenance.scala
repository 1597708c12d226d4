package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table maintenance — the write-side operations that keep a 100 TB
  * parquet estate healthy between queries. No DuckDB oracle (these are
  * filesystem effects, not row transforms); `MaintenanceSpec` asserts
  * the effects directly: file counts, byte-identical untouched
  * partitions, exact surviving row sets.
  *
  *   - [[compact]] — the small-file problem: streaming sinks and
  *     fine-grained partitioning leave thousands of KB-sized files, and
  *     scan cost becomes per-FILE overhead (footer reads, task
  *     scheduling) instead of per-byte. Rewrite into ~`targetBytes`
  *     files: one read + one round-robin exchange, atomically replacing
  *     the directory contents via a temp-dir + rename through Hadoop
  *     `FileSystem` (works on any FS the path resolves to).
  *   - [[deleteKeys]] — targeted erasure (the GDPR/right-to-be-forgotten
  *     op): given a table laid out by [[Layout.shardOf]] partitions,
  *     compute the AFFECTED shards from the keys alone (same hash — no
  *     table scan), then rewrite ONLY those partition directories with
  *     the keys anti-joined out, via dynamic partition overwrite.
  *     Work ∝ affected shards, not table size: deleting one user from a
  *     16-shard corpus touches one shard; the other 15 directories are
  *     bit-untouched (spec-asserted on file modification stamps).
  */
object Maintenance {

  /** Rewrite `path` into ceil(totalBytes / targetBytes) files (min 1).
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long): (Int, Int) = {
    val hp = new Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: Path) =
      fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles(hp)
    val totalBytes = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(hp.getParent, hp.getName + "_compact_tmp")
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: the rename pair is not atomic as a unit, but the data is
    // never lost — the rewritten copy exists before the original goes
    val bak = new Path(hp.getParent, hp.getName + "_compact_old")
    require(fs.rename(hp, bak), s"rename $hp -> $bak failed")
    require(fs.rename(tmp, hp), s"rename $tmp -> $hp failed")
    fs.delete(bak, true)
    (before.length, dataFiles(hp).length)
  }

  /** Remove rows whose `keyCol` is in `keys` from a table written with
    * `partitionBy("shard")` where `shard = Layout.shardOf(keyCol)`.
    * Only partitions that can contain a doomed key are rewritten.
    * Returns the number of shard partitions rewritten.
    */
  def deleteKeys(spark: SparkSession, tablePath: String, keyCol: String,
                 keys: Seq[Long]): Int = {
    import spark.implicits._
    val doomed = keys.toDF(keyCol)
    val affected = doomed.select(Layout.shardOf(col(keyCol)).as("shard"))
      .distinct().as[Long].collect().sorted // bounded by NumShards
    if (affected.isEmpty) return 0
    val survivors = spark.read.parquet(tablePath)
      .filter(col("shard").isin(affected.map(Long.box): _*)) // partition-pruned read
      .join(broadcast(doomed), Seq(keyCol), "left_anti")
    // dynamic overwrite only touches partitions PRESENT in the write; a
    // shard whose every row is doomed produces no survivor rows and
    // would silently keep its old files — delete those dirs explicitly
    val surviving = survivors.select(col("shard")).distinct().as[Long].collect().toSet
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try survivors.write.mode("overwrite").partitionBy("shard").parquet(tablePath)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    affected.filterNot(surviving).foreach { s =>
      fs.delete(new Path(tablePath, s"shard=$s"), true)
    }
    affected.length
  }
}
