package graft

import graft.pipelines.Redirects

class RedirectsSpec extends SparkSuite {

  test("resolution matches an exact reference walk; all outcomes occur") {
    val ids = Tables.documents(spark, Sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // the plant's Location target: %61==13 points FORWARD (the cycle
    // plant — and chains passing through such a node divert into the
    // cycle too), everything else to the previous doc
    def next(j: Long) = if (j % 61 == 13) j + 1 else j - 1
    def expected(id: Long): (Long, Int, String) = {
      var cur = id; var hops = 0
      for (_ <- 1 to Redirects.MaxHops)
        if (ids.contains(cur) && cur % 7 != 0) { cur = next(cur); hops += 1 }
      (cur, hops,
        if (ids.contains(cur) && cur % 7 == 0) "ok" else "unresolved")
    }
    val rows = Redirects.resolve(spark, Sf).collect()
    assert(rows.length == ids.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (cur, hops, status) = expected(id)
      assert(r.getAs[String]("final_url").endsWith(s"/p$cur") &&
        r.getAs[Int]("hops") == hops &&
        r.getAs[String]("final_status") == status, s"doc $id")
    }
    // non-vacuous: terminals, full-budget successes, and failures all occur
    val got = rows.map(r => (r.getAs[Int]("hops"), r.getAs[String]("final_status")))
    assert(got.contains((0, "ok")))
    assert(got.contains((Redirects.MaxHops, "ok")))
    assert(got.exists(_._2 == "unresolved"))
  }

  test("reconcile: canonical link wins, then a moved-and-resolved chain, then self") {
    val ids = Tables.documents(spark, Sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    def next(j: Long) = if (j % 61 == 13) j + 1 else j - 1
    def walk(id: Long): (Long, Int, Boolean) = {
      var cur = id; var hops = 0
      for (_ <- 1 to Redirects.MaxHops)
        if (ids.contains(cur) && cur % 7 != 0) { cur = next(cur); hops += 1 }
      (cur, hops, ids.contains(cur) && cur % 7 == 0)
    }
    val rows = Redirects.reconcile(spark, Sf).collect()
    assert(rows.length == ids.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (cur, hops, ok) = walk(id)
      val (key, src) =
        if (id % 4 == 0)
          (s"https://canon${id % 23}.example.com/c${id / 4}", "canonical")
        else if (ok && hops > 0) (s"https://r${cur % 23}.example.com/p$cur", "redirect")
        else (s"https://r${id % 23}.example.com/p$id", "self")
      assert(r.getAs[String]("index_key") == key &&
        r.getAs[String]("source") == src, s"doc $id")
    }
    val sources = rows.map(_.getAs[String]("source")).toSet
    assert(sources == Set("canonical", "redirect", "self"))
    // both planted attribute orders extract (href-first is %8==0)
    assert(rows.exists(r => r.getAs[Long]("doc_id") % 8 == 0 &&
      r.getAs[String]("source") == "canonical"))
    assert(rows.exists(r => r.getAs[Long]("doc_id") % 8 == 4 &&
      r.getAs[String]("source") == "canonical"))
  }

  test("canonicalHref property: any attribute order and decoy mix extracts right") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    val cases = (0 until 300).map { i =>
      val href = s"https://c$i.example.com/p$i"
      val declares = i % 3 != 0
      // the canonical tag's attributes in random order, with noise
      // attributes interleaved
      val attrs = rnd.shuffle(List(
        s"""href="$href"""", """rel="canonical"""",
        """type="text/html"""", s"""media="screen$i""""))
      val canonTag = if (declares) attrs.mkString("<link ", " ", "/>") else ""
      // decoy links before and/or after, never rel=canonical
      val decoys = List(
        s"""<link rel="stylesheet" href="https://s$i.example.com/a.css"/>""",
        s"""<link rel="alternate" href="https://alt$i.example.com/f"/>""")
      val parts = rnd.shuffle(canonTag :: decoys).mkString
      (s"<html><head>$parts</head><body>x</body></html>",
        if (declares) href else null)
    }
    val got = cases.map(_._1).toDF("html")
      .select(graft.pipelines.Redirects.canonicalHref(col("html")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    cases.map(_._2).zip(got).zipWithIndex.foreach { case ((exp, act), i) =>
      assert(act == exp, s"case $i")
    }
  }

  test("plan: keyed hash joins only — a redirect walk must never go cartesian") {
    val plan = Redirects.resolve(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"non-keyed join in redirect resolution:\n$plan")
  }
}
