package graft

import org.apache.spark.sql.functions._
import graft.text.Boilerplate

class BoilerplateSpec extends SparkSuite {

  test("segmentsOf windows tokens in fives with a ragged tail and empty-safe guard") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e"),
      (3L, "  ")
    ).toDF("doc_id", "text")
    val segs = df
      .select(col("doc_id"),
        Boilerplate.segmentsOf(graft.text.TextOps.tokenize(col("text"))).as("segs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(segs(1L) == Seq("a b c d e", "f g"))
    assert(segs(2L) == Seq("a b c d e"))
    assert(segs(3L) == Seq.empty)
  }

  test("lineDedup strips segments shared by >= MinDocs docs and rebuilds in order") {
    import spark.implicits._
    val boiler = "all rights reserved legal footer"
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon $boiler"),
      (2L, s"one two three four five $boiler tail words after footer x"),
      (3L, s"$boiler unique closing words here now"),
      (4L, "totally original text with no shared segments at all ok")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("boilerdocs")

    // run the operator body against an in-memory table by round-tripping
    // through parquet in a temp dir shaped like a fixture sfDir
    val dir = java.nio.file.Files.createTempDirectory("graft-boiler").toString
    docs.select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Boilerplate.lineDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    // the shared 5-token boilerplate segment appears in docs 1,2,3 => stripped
    assert(out(1L) == ((2L, 1L, "alpha beta gamma delta epsilon")))
    assert(out(2L)._2 == 1L)
    assert(out(2L)._3 == "one two three four five tail words after footer x")
    assert(out(3L) == ((2L, 1L, "unique closing words here now")))
    // doc 4 untouched
    assert(out(4L)._2 == 0L)
    assert(out(4L)._3 == "totally original text with no shared segments at all ok")
  }

  test("copies of one document do not turn its segments into boilerplate") {
    import spark.implicits._
    val unique = "totally original words that exist nowhere else in corpus body"
    // doc 1 plus four byte-identical copies: raw-doc counting would see
    // every segment in 5 "documents" >= MinDocs and strip doc 1 empty
    val docs = (Seq(1L, 11L, 12L, 13L, 14L).map(_ -> unique) :+
      (2L -> "different content entirely here with its own words okay"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-boiler-cp").toString
    docs.select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Boilerplate.lineDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((0L, unique)), "copy inflation must not strip the doc")
    assert(out(11L) == ((0L, unique)))
    assert(out(2L)._1 == 0L)
  }

  test("run collapse removes exactly the planted consecutive duplicates") {
    import spark.implicits._
    // hand-check the collapse on known arrays, incl. a triple run and nulls-free tail
    val got = Seq(Seq("a", "a", "b", "a", "c", "c", "c"), Seq("x"), Seq[String]())
      .toDF("lines").select(Boilerplate.collapseRuns(col("lines")).as("kept"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got.toList == List(List("a", "b", "a", "c"), List("x"), Nil))
    // on the planted fixture, removed count equals the planted-double count
    val rows = Boilerplate.runCollapse(spark, Sf)
      .select(col("doc_id"), (col("n_lines_in") - col("n_lines_out")).as("removed"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"),
        Boilerplate.segmentsOf(graft.text.TextOps.tokenize(col("text"))).as("segs"))
      .select(col("doc_id"), size(filter(col("segs"), (_, i) =>
        (col("doc_id") + i) % 4 === 0)).cast("long").as("planted"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === expected)
    assert(rows.values.sum > 0, "the plant must actually create runs")
  }

  test("host templates strip host-relatively: same text on a small host survives") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val banner = "promo x banner offer today" // one exact 5-token segment
    // hostA: 6 pages, 4 carry the banner (>= 50%); hostB: 2 pages with
    // the SAME banner text (below MinHostPages -> never a template)
    val rows =
      (0 until 6).map(i => (i.toLong, "hostA",
        (if (i < 4) banner + " " else "") + s"alpha beta gamma delta epsilon$i")) ++
      Seq((10L, "hostB", banner + " one two three four five"),
          (11L, "hostB", banner + " six seven eight nine ten"))
    val docs = rows.toDF("doc_id", "source", "text")
    // bypass the fixture plant: run the core stages directly
    val segs = docs
      .select(col("doc_id"), col("source"),
        graft.text.TextOps.tokenize(col("text")).as("tk"))
      .select(col("doc_id"), col("source"),
        posexplode(graft.text.Boilerplate.segmentsOf(col("tk"))).as(Seq("pos", "seg")))
      .withColumn("h", md5(col("seg")))
    val pages = segs.select(col("source"), col("doc_id")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("pages"))
    val tmpl = segs.select(col("source"), col("h"), col("doc_id")).distinct()
      .groupBy(col("source"), col("h")).agg(count(lit(1)).as("nd"))
      .join(pages, Seq("source"))
      .filter(col("pages") >= graft.text.Boilerplate.MinHostPages &&
        col("nd") * 2 >= col("pages"))
      .collect()
    val tmplHosts = tmpl.map(_.getString(0)).toSet
    assert(tmplHosts == Set("hostA"), s"got $tmplHosts")
  }
}
