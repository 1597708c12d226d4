package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class Mp4HeaderSpec extends SparkSuite {

  test("planted MP4s round-trip every header field from doc_id arithmetic") {
    val rows = Multimodal.videoHeaderDecode(spark, Sf)
      .orderBy("media_id").limit(40).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Long]("timescale") == 600 + (id % 3) * 400, s"timescale doc $id")
      assert(r.getAs[Long]("duration") == 500 + id % 9999, s"duration doc $id")
      assert(r.getAs[Int]("n_tracks") == (if (id % 3 == 0) 2 else 1), s"n_tracks doc $id")
      assert(r.getAs[Long]("track_id") == 1 + id % 7, s"track_id doc $id")
      assert(r.getAs[Int]("width") == 320 + (id % 8) * 16, s"width doc $id")
      assert(r.getAs[Int]("height") == 240 + (id % 5) * 16, s"height doc $id")
      assert(r.getAs[String]("handler") == (if (id % 4 == 3) "soun" else "vide"),
        s"handler doc $id")
    }
    // doc_id parity picks mvhd/tkhd version, so the slice covers v0 AND v1
    assert(rows.exists(_.getAs[Long]("media_id") % 2 == 0))
    assert(rows.exists(_.getAs[Long]("media_id") % 2 == 1))
  }

  private def parse(bytes: Array[Byte]) = {
    import spark.implicits._
    Seq(bytes).toDF("content")
      .select(org.apache.spark.sql.GraftColumnShim.column(
        graft.plans.Mp4Header(
          org.apache.spark.sql.GraftColumnShim.expression(col("content")))).as("h"))
      .select("h.*").collect()(0)
  }

  test("garbage and truncated blobs yield null fields, never a throw") {
    val garbage = parse("not an mp4 at all".getBytes)
    assert(garbage.isNullAt(garbage.fieldIndex("timescale")))
    // a real plant truncated mid-moov: header walk stops cleanly
    val planted = Multimodal.videoHeaderDecode(spark, Sf) // sanity that plant exists
    assert(planted.limit(1).count() == 1)
    val full = spark.range(1).withColumnRenamed("id", "doc_id")
      .select(Multimodal.plantMp4.as("c")).collect()(0).getAs[Array[Byte]](0)
    val cut = parse(full.take(60)) // ends inside moov's mvhd
    assert(cut.isNullAt(cut.fieldIndex("width")))
  }

  test("size==1 largesize and size==0 to-end boxes parse") {
    // hand-build: ftyp(16) + moov with 64-bit largesize wrapping a v0 mvhd
    def be32(v: Long) = Array[Byte](((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    val mvhd = be32(108) ++ "mvhd".getBytes ++ Array[Byte](0, 0, 0, 0) ++
      be32(0) ++ be32(0) ++ be32(777) ++ be32(4242) ++
      be32(0x00010000L) ++ Array[Byte](1, 0) ++ new Array[Byte](10) ++
      new Array[Byte](36) ++ new Array[Byte](24) ++ be32(2)
    val moovPayload = mvhd
    val moov = be32(1) ++ "moov".getBytes ++ be64(16L + moovPayload.length) ++ moovPayload
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)
    val r = parse(ftyp ++ moov)
    assert(r.getAs[Long]("timescale") == 777L)
    assert(r.getAs[Long]("duration") == 4242L)
    // size==0: mdat "to end of file" after moov must not derail the walk
    val mdat0 = be32(0) ++ "mdat".getBytes ++ Array.fill[Byte](9)(0x5a)
    val r2 = parse(ftyp ++ moov ++ mdat0)
    assert(r2.getAs[Long]("timescale") == 777L)
  }

  test("plan has no data shuffle — only the deliberate round-robin widen") {
    val df = Multimodal.videoHeaderDecode(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"), "header decode must not shuffle by key")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
  }
}
