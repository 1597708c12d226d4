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
}
