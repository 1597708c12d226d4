package graft

import org.apache.spark.sql.functions._
import graft.ops.{SkewProfile, Versioning}

class VersioningSpec extends SparkSuite {

  test("fingerprint is order- and partitioning-independent; any row change flips it") {
    import spark.implicits._
    val a = Seq((1L, "aa", "en", "s1"), (2L, "bb", "de", "s2"), (3L, "cc", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val f1 = Versioning.fingerprint(a).collect()(0)
    val shuffled = a.orderBy(desc("doc_id")).repartition(7)
    val f2 = Versioning.fingerprint(shuffled).collect()(0)
    assert(f1.getLong(0) == 3L && f1.getLong(1) == f2.getLong(1))
    val changed = a.withColumn("text",
      when(col("doc_id") === 2L, lit("BB")).otherwise(col("text")))
    assert(Versioning.fingerprint(changed).collect()(0).getLong(1) != f1.getLong(1))
  }

  test("version diff counts each status exactly on a hand corpus") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val b = Seq((1L, "x"), (2L, "Y2"), (9L, "new")).toDF("doc_id", "text")
    val got = Versioning.versionDiff(a, b).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("same" -> 1L, "changed" -> 1L, "only_a" -> 1L, "only_b" -> 1L))
  }

  test("skew profile: uniform keys read ~1000 milli, a hot key reads its multiple") {
    import spark.implicits._
    val uniform = (1L to 100L).flatMap(k => Seq.fill(4)(k)).toDF("k")
    val u = SkewProfile.profile(uniform, "k").collect()(0)
    assert(u.getLong(0) == 100L && u.getLong(2) == 4L && u.getLong(4) == 1000L)
    val hot = ((1L to 99L).map(k => Seq.fill(2)(k)).flatten ++ Seq.fill(198)(7L)).toDF("k")
    val h = SkewProfile.profile(hot, "k").collect()(0)
    assert(h.getLong(3) == 7L, "hot key identified")
    assert(h.getLong(4) == 198L * 100L * 1000L / (198L + 198L))
  }
}
