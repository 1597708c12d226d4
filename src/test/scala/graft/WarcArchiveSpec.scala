package graft

import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.WarcArchive

/** The archive-erasure contract (VERDICT r10 #9), MaintenanceSpec
  * style: filesystem effects asserted directly — untouched shards
  * byte-identical, member offsets contiguous before AND after a
  * splice, fully-doomed shards deleted, erasure idempotent. The row
  * contract (survivors re-read from disk match the closed-form plant)
  * is the `q_warc_erasure` oracle gate.
  */
class WarcArchiveSpec extends SparkSuite {

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def shardMd5s(dir: String): Map[String, String] =
    fs.listStatus(new Path(dir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".warc.gz"))
      .map { s =>
        val bytes = new Array[Byte](s.getLen.toInt)
        val in = fs.open(s.getPath)
        try in.readFully(0, bytes) finally in.close()
        s.getPath.getName ->
          MessageDigest.getInstance("MD5").digest(bytes).map("%02x".format(_)).mkString
      }.toMap

  private def tmpDir(name: String): String = {
    val d = new java.io.File(sys.props("java.io.tmpdir"), name).getPath
    d
  }

  private def indexRows(out: String): Array[(Long, Long, Long, Long)] =
    WarcArchive.readIndex(spark, out)
      .select(col("shard_id"), col("doc_id"), col("member_offset"), col("member_bytes"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  private def assertContiguous(out: String): Unit =
    indexRows(out).groupBy(_._1).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"shard $shard first offset ${sorted.head._3}")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 == a._3 + a._4, s"shard $shard gap: $a -> $b")
        case _ =>
      }
      val fileLen = fs.getFileStatus(
        new Path(out, WarcArchive.shardFileName(shard))).getLen
      assert(fileLen == sorted.last._3 + sorted.last._4,
        s"shard $shard file $fileLen != index ${sorted.last._3 + sorted.last._4}")
    }

  test("write: every capture indexed, offsets contiguous, disk round-trips the corpus") {
    val out = tmpDir("graft_warcarch_spec_write")
    WarcArchive.writeArchive(spark, Sf, out)
    val idx = indexRows(out)
    val docCount = Tables.documents(spark, Sf).count()
    assert(idx.length == docCount, s"index rows ${idx.length} != docs $docCount")
    assert(idx.map(_._1).distinct.length > 1, "fixture must span multiple shards")
    assertContiguous(out)
    val reread = WarcArchive.readArchive(spark, out)
    assert(reread.count() == docCount)
    assert(reread.select(col("doc_id")).distinct().count() == docCount,
      "payload self-identification must survive the disk round trip")
  }

  test("erase: only containing shards rewritten, others byte-identical, idempotent") {
    val out = tmpDir("graft_warcarch_spec_erase")
    WarcArchive.writeArchive(spark, Sf, out)
    val idx = indexRows(out)
    val targetShard = idx.map(_._1).max // last (possibly ragged) shard
    val doomed = idx.filter(_._1 == targetShard).map(_._2).take(3).toSeq
    assert(doomed.size == 3)
    // the doomed docs must live ONLY in the target shard for the
    // byte-identity assertion to be meaningful
    assert(idx.filter(r => doomed.contains(r._2)).forall(_._1 == targetShard))
    val before = shardMd5s(out)
    val rewritten = WarcArchive.erase(spark, out, doomed)
    assert(rewritten == 1, s"expected 1 shard rewritten, got $rewritten")
    val after = shardMd5s(out)
    val targetName = WarcArchive.shardFileName(targetShard)
    assert(after(targetName) != before(targetName), "affected shard must change")
    (before.keySet - targetName).foreach { name =>
      assert(after(name) == before(name), s"untouched shard $name changed bytes")
    }
    assertContiguous(out)
    val survivors = WarcArchive.readArchive(spark, out)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    doomed.foreach(d => assert(!survivors(d), s"doomed doc $d still readable"))
    assert(survivors.size.toLong == idx.length - doomed.size)
    // idempotent: nothing left to erase, no shard touched
    val beforeSecond = shardMd5s(out)
    assert(WarcArchive.erase(spark, out, doomed) == 0)
    assert(shardMd5s(out) == beforeSecond)
  }

  test("erase: a multi-shard erasure fans the splice across >1 task") {
    val out = tmpDir("graft_warcarch_spec_par")
    WarcArchive.writeArchive(spark, Sf, out)
    val idx = indexRows(out)
    val shards = idx.map(_._1).distinct.sorted
    assert(shards.length > 1)
    // one doomed doc from EVERY shard -> every shard spliced
    val doomed = shards.map(s => idx.filter(_._1 == s).map(_._2).min).toSeq
    val rewritten = WarcArchive.erase(spark, out, doomed)
    assert(rewritten == shards.length)
    assert(WarcArchive.lastSplicePartitions > 1,
      s"splice must distribute: ${WarcArchive.lastSplicePartitions} task(s) " +
        s"for ${shards.length} shards")
    assertContiguous(out)
    val survivors = WarcArchive.readArchive(spark, out)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    doomed.foreach(d => assert(!survivors(d)))
    assert(survivors.size.toLong == idx.length - doomed.size)
    // no temp droppings from the distributed pass
    assert(fs.globStatus(new Path(out, "*.erase_tmp.*")).forall(_ => false),
      "orphan erase temp files left behind")
  }

  test("erase: two sequential erasures of the SAME shard compose — the second " +
    "reads the first's rewritten index and offsets stay exact") {
    val out = tmpDir("graft_warcarch_spec_seq")
    WarcArchive.writeArchive(spark, Sf, out)
    val idx = indexRows(out)
    val targetShard = idx.map(_._1).min
    val inShard = idx.filter(_._1 == targetShard).map(_._2).sorted
    assert(inShard.length >= 5, "need enough docs in the shard for two rounds")
    // round 1 erases even positions, round 2 odd positions of the SAME
    // shard: round 2's splice must run off the POST-round-1 offsets
    // (any stale-index read would slice garbage and fail the digest
    // re-verify inside erase)
    val round1 = inShard.zipWithIndex.collect { case (d, i) if i % 2 == 0 => d }.take(2).toSeq
    val round2 = inShard.zipWithIndex.collect { case (d, i) if i % 2 == 1 => d }.take(2).toSeq
    assert(WarcArchive.erase(spark, out, round1) == 1)
    assertContiguous(out)
    assert(WarcArchive.erase(spark, out, round2) == 1)
    assertContiguous(out)
    val survivors = WarcArchive.readArchive(spark, out)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    (round1 ++ round2).foreach(d => assert(!survivors(d), s"doc $d still readable"))
    assert(survivors.size.toLong == idx.length - round1.size - round2.size)
  }

  test("erase: a fully-doomed shard's file and index partition are deleted") {
    val out = tmpDir("graft_warcarch_spec_full")
    WarcArchive.writeArchive(spark, Sf, out)
    val idx = indexRows(out)
    val shard0Docs = idx.filter(_._1 == 0L).map(_._2).toSeq
    val rewritten = WarcArchive.erase(spark, out, shard0Docs)
    assert(rewritten == 1)
    assert(!fs.exists(new Path(out, WarcArchive.shardFileName(0L))),
      "fully-doomed shard file must be deleted")
    assert(!fs.exists(new Path(out, "_index/shard_id=0")),
      "fully-doomed shard's index partition must be deleted")
    val left = WarcArchive.readArchive(spark, out).count()
    assert(left == idx.length - shard0Docs.size)
    assertContiguous(out)
  }
}
