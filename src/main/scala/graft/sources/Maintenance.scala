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
    val tmp = new Path(hp.getParent, hp.getName + "_compact_tmp")
    val bak = new Path(hp.getParent, hp.getName + "_compact_old")
    // crash recovery from a prior interrupted run, keyed on which swap
    // step died (write tmp → rename live→bak → rename tmp→live → rm bak):
    //   - live missing + tmp & bak present: died between the two renames;
    //     tmp holds the complete rewrite — finish the swap
    //   - live present + tmp present: died mid-write; tmp is garbage
    //   - live present + bak present: died before the final delete
    if (!fs.exists(hp) && fs.exists(tmp) && fs.exists(bak)) {
      require(fs.rename(tmp, hp), s"recovery rename $tmp -> $hp failed")
      fs.delete(bak, true)
    } else {
      if (fs.exists(tmp)) fs.delete(tmp, true)
      if (fs.exists(bak)) fs.delete(bak, true)
    }
    // a partitionBy layout has key= subdirectories; listStatus would see
    // zero top-level data bytes (n=1) and the rewrite would flatten the
    // partition structure — compact each partition directory individually
    require(!fs.listStatus(hp).exists(_.isDirectory),
      s"compact requires an unpartitioned table directory; $path contains " +
        "subdirectories — run compact on each partition directory instead")
    def dataFiles(p: Path) =
      fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles(hp)
    val totalBytes = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: the rename pair is not atomic as a unit — readers racing the
    // swap can observe a missing path for the instant between renames —
    // but data is never lost: the rewritten copy exists before the
    // original goes, and the recovery block above completes a torn swap
    // on the next run
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
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // shards actually on disk: a doomed key may hash to a shard the table
    // never wrote — counting or "rewriting" those would report work that
    // did not happen (and a spurious delete of a non-existent dir)
    val present = fs.listStatus(new Path(tablePath))
      .filter(_.isDirectory).map(_.getPath.getName)
      .collect { case n if n.startsWith("shard=") => n.stripPrefix("shard=").toLong }
      .toSet
    val affected = doomed.select(Layout.shardOf(col(keyCol)).as("shard"))
      .distinct().as[Long].collect().sorted // bounded by NumShards
      .filter(present)
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
    affected.filterNot(surviving).foreach { s =>
      fs.delete(new Path(tablePath, s"shard=$s"), true)
    }
    // post-condition: erasure must not be silently incomplete (a crash
    // between the overwrite and the empty-shard deletes above would leave
    // a fully-doomed shard's old files live). Work ∝ affected shards.
    val remaining = affected.filter(s => fs.exists(new Path(tablePath, s"shard=$s")))
    if (remaining.nonEmpty) {
      val leftover = spark.read.parquet(tablePath)
        .filter(col("shard").isin(remaining.map(Long.box): _*))
        .join(broadcast(doomed), Seq(keyCol), "left_semi").count()
      require(leftover == 0,
        s"erasure incomplete: $leftover doomed rows remain under $tablePath — retry deleteKeys")
    }
    affected.length
  }
}
