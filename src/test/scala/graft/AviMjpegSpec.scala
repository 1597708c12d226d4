package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.plans.{AviFrames, AviPlant, JpegPlant}

class AviMjpegSpec extends SparkSuite {

  private def parse(bytes: Array[Byte]) = {
    import spark.implicits._
    Seq(bytes).toDF("b")
      .select(org.apache.spark.sql.GraftColumnShim.column(
        AviFrames(org.apache.spark.sql.GraftColumnShim.expression(col("b")))).as("s"))
      .select("s.*").collect()(0)
  }

  test("planted MJPEG streams fold to the closed-form per-frame arithmetic") {
    val rows = Multimodal.videoFrameStats(spark, Sf).orderBy("media_id").limit(30).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val nf = 2 + (id % 3).toInt
      val wb = 1 + (id % 4).toInt; val hb = 1 + (id % 3).toInt
      val vals = for (f <- 0 until nf; k <- 0 until wb * hb)
        yield JpegPlant.blockValOf(id, f, k)
      assert(r.getAs[Int]("n_frames") == nf, s"n_frames doc $id")
      assert(r.getAs[Int]("n_bad") == 0, s"n_bad doc $id")
      assert(r.getAs[Int]("width") == wb * 8 && r.getAs[Int]("height") == hb * 8)
      assert(r.getAs[Long]("n_pixels") == nf.toLong * wb * hb * 64)
      assert(r.getAs[Long]("sum_gray") == 64L * vals.map(_.toLong).sum, s"sum doc $id")
      assert(r.getAs[Int]("peak") == vals.max, s"peak doc $id")
    }
  }

  test("audio chunks and JUNK are skipped; torn frames count as bad, not fatal") {
    val good = AviPlant.encode(3L)
    val r = parse(good)
    assert(r.getAs[Int]("n_bad") == 0)
    // corrupt the SECOND frame's JPEG payload (flip bytes after its SOI)
    val torn = good.clone()
    var count = 0; var i = 0; var target = -1
    while (i < torn.length - 4 && target < 0) {
      if (torn(i) == '0' && torn(i + 1) == '0' && torn(i + 2) == 'd' && torn(i + 3) == 'c') {
        count += 1
        if (count == 2) target = i + 8
      }
      i += 1
    }
    assert(target > 0)
    var j = target + 4
    while (j < target + 24 && j < torn.length) { torn(j) = 0x00; j += 1 }
    val r2 = parse(torn)
    assert(r2.getAs[Int]("n_frames") == r.getAs[Int]("n_frames"))
    assert(r2.getAs[Int]("n_bad") == 1, "damaged frame counted, stream survives")
    assert(r2.getAs[Long]("sum_gray") < r.getAs[Long]("sum_gray"))
  }

  test("garbage and truncation yield nulls / clean stops") {
    val g = parse("not an avi".getBytes)
    assert(g.isNullAt(g.fieldIndex("n_frames")))
    val cut = parse(AviPlant.encode(4L).take(80)) // ends inside hdrl
    assert(cut.getAs[Int]("n_frames") == 0)
  }

  test("plan has no data shuffle") {
    val plan = Multimodal.videoFrameStats(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"))
  }
}
