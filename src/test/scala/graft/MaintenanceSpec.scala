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
