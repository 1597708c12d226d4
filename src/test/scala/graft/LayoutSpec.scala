package graft

import org.apache.spark.sql.functions._

import graft.sources.Layout

class LayoutSpec extends SparkSuite {

  test("range-sorted layout: files cover disjoint key ranges, rows sorted within files") {
    val dir = java.nio.file.Files.createTempDirectory("layout-spec").toString + "/t"
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    Layout.writeRangeSorted(li, "l_orderkey", 8, dir)

    val ranges = Layout.fileRanges(spark, dir, "l_orderkey")
      .orderBy("lo").collect()
    assert(ranges.length == 8)
    assert(ranges.map(_.getLong(3)).sum == li.count())
    // disjoint: each file's hi < next file's lo (ties of one key never split)
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) < b.getLong(1),
        s"file ranges overlap: [${a.getLong(1)},${a.getLong(2)}] vs [${b.getLong(1)},${b.getLong(2)}]")
    }
    // sorted within each file: per-file row sequence is non-decreasing
    import spark.implicits._
    val disordered = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("l_orderkey"))
      .mapPartitions { it =>
        var bad = 0L
        var prevFile = ""; var prev = Long.MinValue
        it.foreach { r =>
          val f = r.getString(0); val k = r.getLong(1)
          if (f == prevFile && k < prev) bad += 1
          prevFile = f; prev = k
        }
        Iterator(bad)
      }.reduce(_ + _)
    assert(disordered == 0L)
  }

  test("a selective range predicate touches one file of the layout") {
    val dir = java.nio.file.Files.createTempDirectory("layout-spec2").toString + "/t"
    val li = spark.read.parquet(s"$Sf/lineitem.parquet").select("l_orderkey", "l_quantity")
    Layout.writeRangeSorted(li, "l_orderkey", 8, dir)
    val probe = li.agg(min("l_orderkey")).collect()(0).getLong(0)
    val files = spark.read.parquet(dir)
      .filter(col("l_orderkey") === probe)
      .select(input_file_name()).distinct().count()
    assert(files == 1L) // all hits clustered in a single file
  }

  test("z-order layout: a box predicate on BOTH keys touches a fraction of files") {
    import graft.sources.Layout
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val zdir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val sdir = java.nio.file.Files.createTempDirectory("graft-singlekey").toString
    val files = 16
    Layout.writeZOrdered(li, "l_partkey", "l_suppkey", files, zdir)
    Layout.writeRangeSorted(li, "l_orderkey", files, sdir) // layout sorted by an UNRELATED key
    def touched(path: String): Long = {
      val df = spark.read.parquet(path)
      df.filter(col("l_partkey").between(100, 180) && col("l_suppkey").between(10, 40))
        .select(input_file_name()).distinct().count()
    }
    val zTouched = touched(zdir)
    val sTouched = touched(sdir)
    // the z-layout clusters the box into few files; the unrelated-key
    // layout scatters it across essentially all of them
    assert(zTouched < files / 2, s"z-order touched $zTouched of $files files")
    assert(zTouched < sTouched,
      s"z-order ($zTouched files) must beat an unrelated-key sort ($sTouched files)")
    // morton sanity: x=0b101 → z bits 0,4; y=0b11 → z bits 1,3 → z=27
    import spark.implicits._
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zOf(col("x"), col("y"))).collect()(0).getLong(0)
    assert(z === 27L, s"z=$z")
  }

  test("sharded write: partition dirs agree with the manifest; assignment is append-stable") {
    import graft.sources.Layout
    val tmp = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .withColumn("shard", Layout.shardOf(col("doc_id")))
    docs.write.mode("overwrite").partitionBy("shard").parquet(tmp)
    val back = spark.read.parquet(tmp)
      .groupBy("shard").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Number]("shard").longValue() -> r.getLong(1)).toMap
    val manifest = Layout.shardManifest(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back === manifest.filter(_._2 > 0))
    // append stability: assignment depends only on the key, so a re-read
    // subset maps identically (no rand(), no partition-id dependence)
    val twice = docs.select("doc_id", "shard").limit(50).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val again = spark.read.parquet(s"$Sf/documents.parquet").repartition(7)
      .select(col("doc_id"), Layout.shardOf(col("doc_id")).as("shard"))
      .filter(col("doc_id").isin(twice.keys.toSeq.map(Long.box): _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === twice)
  }
}
