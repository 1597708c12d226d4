package graft

import org.apache.spark.sql.functions._
import graft.plans.{AviDhash, AviPlant, JpegDhash, JpegPlant}
import graft.multimodal.VideoHash

class VideoHashSpec extends SparkSuite {

  test("video signature equals the per-frame JPEG dhash sequence") {
    for (seed <- 1L to 18L) {
      val got = AviDhash.compute(AviPlant.encode(seed), 4, 4)
      assert(got != null, s"seed $seed")
      val nf = AviPlant.framesOf(seed)
      assert(got.getInt(2) == nf, s"seed $seed frame count")
      val sig = got.getArray(3)
      (0 until nf).foreach { f =>
        val frame = JpegDhash.compute(JpegPlant.encodeFrame(seed, f), 4, 4)
        assert(frame != null && sig.getLong(f) == frame.getLong(2),
          s"seed $seed frame $f")
      }
    }
  }

  test("one DhashCore: a video frame hashes like the same raster as a bare JPEG") {
    val got = AviDhash.compute(AviPlant.encode(7L), 4, 4)
    val bare = JpegDhash.compute(JpegPlant.encodeFrame(7L, 0), 4, 4)
    assert(got != null && bare != null)
    assert(got.getArray(3).getLong(0) == bare.getLong(2))
    assert(got.getInt(0) == bare.getInt(0) && got.getInt(1) == bare.getInt(1))
  }

  test("a torn frame nulls the fingerprint (AviFrames counts it instead)") {
    val bytes = AviPlant.encode(5L)
    // find the second 00dc payload and corrupt its entropy bytes
    val idx = {
      var i = -1; var found = 0
      var p = 0
      while (p + 4 <= bytes.length && i < 0) {
        if (bytes(p) == '0' && bytes(p + 1) == '0' &&
            bytes(p + 2) == 'd' && bytes(p + 3) == 'c') {
          found += 1
          if (found == 2) i = p
        }
        p += 1
      }
      i
    }
    assert(idx > 0, "plant must carry a second frame")
    val torn = bytes.clone()
    (idx + 30 until math.min(idx + 40, torn.length)).foreach(i => torn(i) = 0x00)
    assert(AviDhash.compute(torn, 4, 4) == null,
      "a fingerprint demands a clean stream")
    val stats = graft.plans.AviFrames.parse(torn)
    assert(!stats.isNullAt(1) && stats.getInt(1) >= 1,
      "the stats fold keeps counting and reports the tear")
  }

  test("non-AVI and null inputs yield null") {
    assert(AviDhash.compute(Array.fill[Byte](64)(9), 4, 4) == null)
    assert(AviDhash.compute(null, 4, 4) == null)
    assert(AviDhash.compute(JpegPlant.encode(3L), 4, 4) == null,
      "a bare JPEG is not a RIFF container")
  }

  test("banded video join equals brute force; featureless media excluded") {
    val packed = VideoHash.packedSignatures(spark, Sf, expr("doc_id DIV 2"))
      .persist()
    val rows = packed.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    val brute = (for {
      (a, wa, ha, na, sa) <- rows; (b, wb, hb, nb, sb) <- rows
      if a < b && wa == wb && ha == hb && na == nb && sa != 0L && sb != 0L
      ham = java.lang.Long.bitCount(sa ^ sb).toLong
      if ham <= VideoHash.MaxHam
    } yield (a, b, ham)).toSet
    val banded = VideoHash.nearDupPairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    packed.unpersist()
    assert(banded == brute)
    assert(brute.exists(_._3 == 0L), "seed-paired identical videos must appear")
    // the flat class is real in the fixture and must be absent from pairs
    assert(rows.exists(_._5 == 0L), "fixture must contain featureless videos")
    val flat = rows.filter(_._5 == 0L).map(_._1).toSet
    assert(banded.forall { case (a, b, _) => !flat(a) && !flat(b) })
  }

  // ---- long-video array path (X231) + trim tolerance (X232) ----------

  private def bruteDist(sa: Seq[Long], sb: Seq[Long]): Long =
    sa.zip(sb).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum

  test("long-video banded array join equals brute force on 8-16 frame streams") {
    val sigs = VideoHash.plantedSignatures(spark, Sf, expr("doc_id DIV 2"),
      VideoHash.LFBase, VideoHash.LFMod, 0, 0, col("doc_id")).persist()
    val rows = sigs.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
      r.getInt(3), r.getSeq[Long](4)))
    assert(rows.forall(r => r._4 >= 8 && r._4 <= 16 && r._5.length == r._4))
    val live = rows.filter(_._5.exists(_ != 0L))
    val brute = (for {
      (a, wa, ha, na, sa) <- live; (b, wb, hb, nb, sb) <- live
      if a < b && wa == wb && ha == hb && na == nb
      ham = bruteDist(sa, sb)
      if ham <= VideoHash.MaxHam
    } yield (a, b, ham)).toSet
    sigs.unpersist()
    val banded = VideoHash.nearDupPairsLong(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute)
    assert(brute.exists(_._3 == 0L), "seed-paired identical streams must appear")
  }

  test("trim join finds the 1-frame-trimmed twin at hamming 0, equals brute force") {
    def sideRows(off: Int, salt0: Int, drop: Int) =
      VideoHash.plantedSignatures(spark, Sf, col("doc_id"),
        VideoHash.LFBase, VideoHash.LFMod, salt0, drop, col("doc_id") * 2 + off)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getInt(3), r.getSeq[Long](4)))
    val rows = sideRows(0, 0, 0) ++ sideRows(1, 1, 1)
    val live = rows.filter(_._5.exists(_ != 0L))
    val brute = (for {
      (a, wa, ha, na, sa) <- live; (b, wb, hb, nb, sb) <- live
      if a < b && wa == wb && ha == hb && math.abs(na - nb) <= 1
      ham = if (na == nb) bruteDist(sa, sb)
        else if (na == nb + 1)
          math.min(bruteDist(sa.drop(1), sb), bruteDist(sa.take(nb), sb))
        else math.min(bruteDist(sb.drop(1), sa), bruteDist(sb.take(na), sa))
      if ham <= VideoHash.MaxHam
    } yield (a, b, ham)).toSet
    val got = VideoHash.nearDupPairsTrim(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    // every live full stream must meet its front-trimmed twin at distance 0
    val liveIds = live.map(_._1).toSet
    val twins = live.map(_._1).filter(m => m % 2 == 0 && liveIds(m + 1))
    assert(twins.nonEmpty)
    twins.foreach { m =>
      assert(got((m, m + 1, 0L)), s"twin pair ($m, ${m + 1}) missing")
    }
  }

  test("packed signature folds the frame hashes at 16-bit stride") {
    val byFrame = VideoHash.plantedFrameDhash(spark, Sf, col("doc_id"))
      .collect().groupBy(_.getLong(0))
    val packed = VideoHash.packedSignatures(spark, Sf, col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    byFrame.foreach { case (id, frames) =>
      val want = frames.map(r => r.getLong(5) << (16 * r.getInt(4))).sum
      assert(packed(id) == want, s"media $id")
    }
  }
}
