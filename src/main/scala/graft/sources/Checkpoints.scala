package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared machinery for session-lifetime parquet checkpoints of derived
  * tables (near-dup pair tables, ANN index codes) — the build-once /
  * read-many pattern `persist()` cannot provide because the consumers run
  * as separate queries.
  *
  * Contract (each property carries its own failure mode):
  *
  *   - '''Shared-storage paths''': the base must be readable by every
  *     executor — a driver-local temp dir silently loses partitions on a
  *     real cluster. Default base is `<warehouse>/<subdir>`, overridable
  *     per family via a conf key; all I/O goes through Spark's parquet
  *     reader/writer, which resolves the path's own Hadoop `FileSystem`
  *     (local, `file:`, HDFS, object store alike).
  *   - '''Freshness''': the first caller in each JVM recomputes and
  *     overwrites (the built-set is per-JVM), so a persistent base never
  *     serves stale data across code or fixture changes; later callers in
  *     the same JVM pay only a parquet scan.
  *   - '''Cross-JVM isolation''': every path embeds a per-JVM nonce, so
  *     two sessions sharing one warehouse never touch each other's files
  *     (a shared path would let one JVM's `mode("overwrite")` delete
  *     parquet another JVM is mid-read on).
  *   - '''Cleanup''': this JVM's dirs are deleted by a shutdown hook
  *     registered through Hadoop's `ShutdownHookManager` ABOVE the
  *     FileSystem-close priority (a raw `Runtime` hook can lose the race
  *     to the FS-cache finalizer and leak on every clean exit). A
  *     hard-killed JVM leaves orphan dirs, which are inert — no later
  *     run ever reads another nonce's path.
  *   - '''Collision-free keys''': callers key by a full digest (e.g. md5
  *     of the corpus dir), never a 32-bit hashCode, so two corpora can
  *     never silently serve each other's tables.
  */
object Checkpoints {

  private val jvmNonce: String = java.util.UUID.randomUUID().toString.take(12)

  private val built = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private val cleanupRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def registerCleanup(spark: SparkSession): Unit =
    if (cleanupRegistered.compareAndSet(false, true)) {
      val conf = spark.sparkContext.hadoopConfiguration
      org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
        new Runnable {
          def run(): Unit =
            built.forEach { p =>
              try {
                val hp = new org.apache.hadoop.fs.Path(p)
                hp.getFileSystem(conf).delete(hp, true)
              } catch { case _: Throwable => () } // best-effort; orphans are inert
            }
        },
        org.apache.hadoop.fs.FileSystem.SHUTDOWN_HOOK_PRIORITY + 40)
    }

  /** md5 hex digest — the collision-safe checkpoint key for a corpus dir. */
  def digest(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Build-once/read-many: the first call per (resolved path) in this JVM
    * evaluates `build` and writes it; every call returns a fresh reader
    * over the parquet. `confKey` overrides the base dir; otherwise
    * `<warehouse>/<defaultSubdir>`. Locking is PER PATH: two racing first
    * callers of one table must not interleave writes, but a long index
    * build must not block an unrelated family's materialization (a
    * build may itself materialize a dependency — distinct path, distinct
    * lock, so nesting cannot deadlock).
    */
  def materialize(spark: SparkSession, confKey: String, defaultSubdir: String,
                  key: String)(build: => DataFrame): DataFrame =
    materializeMany(spark, confKey, defaultSubdir, Seq(key))(
      (Seq(build), () => ())).head

  /** Multi-table variant for index families whose tables share expensive
    * upstream work: ONE build closure returns every table (aligned with
    * `keys`) plus a cleanup thunk that runs after all writes land —
    * typically unpersisting the shared intermediates the build cached so
    * the corpus-side work runs once across the whole family instead of
    * once per table. All-or-nothing: the family is built under one lock,
    * and a partial build (some keys present, some not) is rebuilt whole.
    */
  def materializeMany(spark: SparkSession, confKey: String, defaultSubdir: String,
                      keys: Seq[String])
                     (build: => (Seq[DataFrame], () => Unit)): Seq[DataFrame] = {
    registerCleanup(spark)
    val base = spark.conf.getOption(confKey).getOrElse(
      spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") + "/" + defaultSubdir)
    val paths = keys.map(k => s"$base/${k}_$jvmNonce")
    locks.computeIfAbsent(paths.head, _ => new Object).synchronized {
      if (!paths.forall(built.contains)) {
        val (dfs, cleanup) = build
        require(dfs.length == paths.length,
          s"build returned ${dfs.length} tables for ${paths.length} keys")
        try dfs.zip(paths).foreach { case (df, p) =>
          df.write.mode("overwrite").parquet(p)
          built.add(p)
        } finally cleanup()
      }
    }
    paths.map(spark.read.parquet)
  }

  /** Conf key selecting RELIABLE lineage truncation for iterative
    * operators (PageRank, component propagation): when set to a
    * shared-storage directory, per-round truncation uses
    * `checkpoint(eager = true)` into it; unset → `localCheckpoint`.
    */
  val IterCheckpointDirKey = "spark.graft.iter.checkpointDir"

  /** Truncate an iterative operator's lineage. Default
    * `localCheckpoint(true)` stores the blocks NON-REPLICATED on
    * executors: fastest, but on a real cluster an executor loss
    * mid-iteration is unrecoverable-by-recompute (the lineage is gone
    * with the block). Setting [[IterCheckpointDirKey]] to shared
    * storage flips every iterative operator to reliable `checkpoint()`
    * — each round persists to the FS and survives any executor loss,
    * at one write+read of the (node-sized, never corpus-sized) table
    * per round. Results are BIT-IDENTICAL in both modes (spec-pinned):
    * the mode changes only the failure domain, never the data.
    *
    * Retention: Spark does NOT delete checkpoint files by default; a
    * long-running driver in reliable mode should set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (at
    * session build) so rounds are reclaimed when their RDDs are GC'd,
    * or point the dir at job-scoped storage it deletes afterwards —
    * the retained files are per-ROUND node-sized tables, never corpus
    * data.
    */
  def truncateLineage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(IterCheckpointDirKey) match {
      case Some(dir) if dir.nonEmpty =>
        // re-point whenever the CONFIGURED dir changes (a stale guard on
        // "some dir is already set" would silently write rounds into
        // whatever an earlier component chose). The JVM-global cache
        // alone is not enough: setCheckpointDir is per-SparkContext, so
        // a NEW context in the same JVM (test rerun, session restart)
        // must be re-pointed even when the configured dir is unchanged —
        // checkpoint(eager) throws without one. Hence also consult the
        // context's own getCheckpointDir.
        if (!lastIterDir.contains(dir) ||
            spark.sparkContext.getCheckpointDir.isEmpty) {
          spark.sparkContext.setCheckpointDir(dir)
          lastIterDir = Some(dir)
        }
        df.checkpoint(eager = true)
      case _ => df.localCheckpoint(true)
    }
  }

  @volatile private var lastIterDir: Option[String] = None
}
