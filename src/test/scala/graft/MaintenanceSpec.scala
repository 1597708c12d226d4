package graft

import org.apache.spark.sql.functions._
import graft.sources.{Layout, Maintenance}

class MaintenanceSpec extends SparkSuite {

  test("compact collapses a many-small-files dir; content identical") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    docs.repartition(40).write.parquet(tmp) // the small-file disease
    val contentBefore = docs.orderBy("doc_id").collect().toSeq
    val (before, after) = Maintenance.compact(spark, tmp, targetBytes = 64L * 1024 * 1024)
    assert(before === 40)
    assert(after < before && after >= 1)
    val back = spark.read.parquet(tmp).orderBy("doc_id").collect().toSeq
    assert(back === contentBefore)
  }

  test("deleteKeys rewrites only affected shards; untouched shard files are bit-identical") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-delete").toString + "/t"
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .withColumn("shard", Layout.shardOf(col("doc_id")))
    docs.write.partitionBy("shard").parquet(tmp)

    val doomed = Seq(3L, 17L, 101L)
    val doomedShards = docs.filter(col("doc_id").isin(doomed.map(Long.box): _*))
      .select("shard").distinct().collect().map(_.getAs[Number](0).longValue()).toSet
    // fingerprint every data file before the delete
    def fileStamps(): Map[String, Long] = {
      val base = new org.apache.hadoop.fs.Path(tmp)
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(base, true)
      val m = scala.collection.mutable.Map[String, Long]()
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet"))
          m(s.getPath.toString) = s.getModificationTime + s.getLen
      }
      m.toMap
    }
    val before = fileStamps()

    val rewritten = Maintenance.deleteKeys(spark, tmp, "doc_id", doomed)
    assert(rewritten === doomedShards.size)

    val after = fileStamps()
    // untouched shards: exactly the same files, stamps unchanged
    def shardOfPath(p: String) = "shard=(\\d+)".r.findFirstMatchIn(p).map(_.group(1).toLong)
    val untouchedBefore = before.filter { case (p, _) => shardOfPath(p).exists(!doomedShards(_)) }
    val untouchedAfter = after.filter { case (p, _) => shardOfPath(p).exists(!doomedShards(_)) }
    assert(untouchedAfter === untouchedBefore, "unaffected shard files must not be rewritten")

    // surviving rows: original minus exactly the doomed keys
    val got = spark.read.parquet(tmp).select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val expect = spark.read.parquet(s"$Sf/documents.parquet").select("doc_id")
      .filter(!col("doc_id").isin(doomed.map(Long.box): _*))
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === expect)
  }

  test("compact refuses a partitionBy layout instead of flattening it") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact-part").toString + "/t"
    (0L until 40L).toDF("doc_id")
      .withColumn("shard", Layout.shardOf(col("doc_id")))
      .write.partitionBy("shard").parquet(tmp)
    intercept[IllegalArgumentException] {
      Maintenance.compact(spark, tmp, targetBytes = 64L * 1024 * 1024)
    }
    // and the table is untouched — still partitioned, rows intact
    assert(spark.read.parquet(tmp).count() === 40)
  }

  test("compact recovers a torn swap left by a prior crash") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-compact-crash").toString
    val t = s"$base/t"
    (0L until 100L).toDF("doc_id").repartition(8).write.parquet(t)
    val content = spark.read.parquet(t).orderBy("doc_id").collect().toSeq
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash between the two renames: the complete rewrite sits
    // in _compact_tmp, the original moved to _compact_old, live path gone
    spark.read.parquet(t).repartition(2).write.parquet(s"${t}_compact_tmp")
    require(fs.rename(new org.apache.hadoop.fs.Path(t),
      new org.apache.hadoop.fs.Path(s"${t}_compact_old")))
    Maintenance.compact(spark, t, targetBytes = 64L * 1024 * 1024)
    assert(spark.read.parquet(t).orderBy("doc_id").collect().toSeq === content)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${t}_compact_tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${t}_compact_old")))
  }

  test("deleteKeys counts only shards actually present in the table") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-delete-absent").toString + "/t"
    // a table holding ONE shard's worth of keys: every other shard dir absent
    val all = (0L until 200L).toDF("doc_id")
      .withColumn("shard", Layout.shardOf(col("doc_id")))
    val keptShard = all.select("shard").collect()(0).getAs[Number](0).longValue()
    all.filter(col("shard") === keptShard).write.partitionBy("shard").parquet(tmp)
    // doom keys across many shards; only the present shard may be counted
    val doomed = (0L until 200L).toSeq
    val rewritten = Maintenance.deleteKeys(spark, tmp, "doc_id", doomed)
    assert(rewritten === 1, "absent shards must not count as rewritten")
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tmp, s"shard=$keptShard")))
  }

  test("deleteKeys removes a fully-doomed shard's directory outright") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-delete-all").toString + "/t"
    // a tiny table where one shard holds exactly one key
    val ids = (0L until 40L).toDF("doc_id")
      .withColumn("shard", Layout.shardOf(col("doc_id")))
    ids.write.partitionBy("shard").parquet(tmp)
    val victim = 7L
    val victimShard = ids.filter(col("doc_id") === victim)
      .select("shard").collect()(0).getAs[Number](0).longValue()
    val shardMates = ids.filter(col("shard") === victimShard)
      .select("doc_id").as[Long].collect().toSeq
    Maintenance.deleteKeys(spark, tmp, "doc_id", shardMates)
    val left = spark.read.parquet(tmp).select("doc_id").as[Long].collect().toSet
    assert(shardMates.forall(!left(_)))
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tmp, s"shard=$victimShard")),
      "a shard with no survivors must not leave stale files behind")
  }
}
