package graft

import org.apache.spark.sql.functions._

import graft.pipelines.Revalidate

class RevalidateSpec extends SparkSuite {

  private lazy val fresh = Revalidate.freshness(spark, Sf).collect()
    .map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("all four caching policies occur and map to their %4 class") {
    val byPolicy = fresh.values.groupBy(_.getAs[String]("policy"))
    assert(byPolicy.keySet == Set("max-age", "no-cache", "expires", "heuristic"))
    fresh.foreach { case (id, r) =>
      val expected = (id % 4) match {
        case 0 => "max-age"; case 1 => "no-cache"
        case 2 => "expires"; case _ => "heuristic"
      }
      assert(r.getAs[String]("policy") == expected, s"doc $id")
    }
  }

  test("max-age branch: ttl/age/fresh replay the RFC 9111 arithmetic") {
    fresh.filter(_._1 % 4 == 0).foreach { case (id, r) =>
      val ttl = 300L + (id % 600) * 7
      val age = id % 400
      assert(r.getAs[Long]("ttl_s") == ttl, s"doc $id")
      assert(r.getAs[Long]("age_s") == age, s"doc $id")
      assert(r.getAs[Int]("fresh") == (if (ttl > age) 1 else 0), s"doc $id")
    }
  }

  test("no-cache always forces revalidation, whatever max-age says") {
    val noCache = fresh.filter(_._1 % 4 == 1)
    assert(noCache.nonEmpty)
    noCache.foreach { case (id, r) =>
      assert(r.getAs[Long]("ttl_s") == 600L, s"doc $id") // max-age parsed anyway
      assert(r.getAs[Int]("fresh") == 0, s"doc $id")
    }
  }

  test("expires branch: BOTH past and future dates occur; sign of ttl decides") {
    val exp = fresh.filter(_._1 % 4 == 2)
    val (past, future) = exp.partition(_._2.getAs[Long]("ttl_s") < 0)
    assert(past.nonEmpty && future.nonEmpty,
      "the %8 branch driver must produce both outcomes inside the all-even %4==2 class")
    exp.foreach { case (id, r) =>
      // replay the parse: pinned dates with doc-varying minutes
      val base = if (id % 8 == 2) 1767225600L else 1803859200L
      val ttl = base + (id % 60) * 60 - Revalidate.NowEpoch
      assert(r.getAs[Long]("ttl_s") == ttl, s"doc $id")
      assert(r.getAs[Int]("fresh") == (if (ttl > 0) 1 else 0), s"doc $id")
    }
  }

  test("heuristic branch: 10% of Last-Modified age, integral division") {
    fresh.filter(_._1 % 4 == 3).foreach { case (id, r) =>
      val lm = 1754006400L + (id % 24) * 3600
      val ttl = (Revalidate.NowEpoch - lm) / 10
      assert(r.getAs[Long]("ttl_s") == ttl, s"doc $id")
      assert(r.getAs[Long]("age_s") == id % 40000, s"doc $id")
      assert(r.getAs[Int]("fresh") == (if (ttl > id % 40000) 1 else 0), s"doc $id")
    }
  }

  test("conditional requests: action classes and validators replay RFC 9110 §13.1") {
    val rows = Revalidate.conditionalRequests(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.keySet == fresh.keySet)
    val actions = rows.values.map(_.getAs[String]("action")).toSet
    assert(actions == Set("skip", "conditional", "unconditional"),
      s"all three actions must occur, got $actions")
    rows.foreach { case (id, r) =>
      val isFresh = fresh(id).getAs[Int]("fresh") == 1
      val etag = if (id % 3 == 0) Some(s""""d$id-v${id % 7}"""") else None
      val lm = if (id % 4 == 3)
        Some(f"Fri, 01 Aug 2025 ${id % 24}%02d:00:00 GMT") else None
      val expected =
        if (isFresh) "skip"
        else if (etag.isDefined || lm.isDefined) "conditional"
        else "unconditional"
      assert(r.getAs[String]("action") == expected, s"doc $id")
      // validators only ride a STALE request, and only when stored
      assert(Option(r.getAs[String]("if_none_match")) ==
        (if (isFresh) None else etag), s"doc $id etag")
      assert(Option(r.getAs[String]("if_modified_since")) ==
        (if (isFresh) None else lm), s"doc $id lm")
    }
  }

  test("ETag plant leaves the freshness gate untouched (no validator column leaks)") {
    // the %3 ETag rotation rides the same planted response the freshness
    // gate parses — its presence must not perturb any decision column
    fresh.values.foreach { r =>
      assert(r.schema.fieldNames.toSeq ==
        Seq("doc_id", "policy", "ttl_s", "age_s", "fresh"))
    }
  }

  test("merge: outcomes follow the status; payload provenance is correct") {
    import org.apache.spark.sql.Row
    val texts = Tables.documents(spark, Sf)
      .select(col("doc_id"), coalesce(col("text"), lit("")))
      .collect().map { case Row(id: Long, t: String) => id -> t }.toMap
    val rows = pipelines.Revalidate.merge(spark, Sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val key = r.getAs[String]("url_key")
      val id = key.substring(key.lastIndexOf('/') + 1).toLong
      (id % 5) match {
        case 0 =>
          assert(r.getAs[String]("outcome") == "revalidated")
          assert(r.getAs[String]("payload") == texts(id), s"doc $id keeps stored copy")
          assert(r.getAs[String]("digest") != null)
        case 4 =>
          assert(r.getAs[String]("outcome") == "gone")
          assert(r.getAs[String]("payload") == null)
          assert(r.getAs[String]("digest") == null)
        case _ =>
          assert(r.getAs[String]("outcome") == "refetched")
          assert(r.getAs[String]("payload") == "v2 " + texts(id).take(50), s"doc $id")
      }
    }
  }

  test("plan shape: freshness is per-row (no hash exchange); merge never goes cartesian") {
    val fPlan = Revalidate.freshness(spark, Sf).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(fPlan).isEmpty, fPlan)
    val cPlan = Revalidate.conditionalRequests(spark, Sf)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(cPlan).isEmpty, cPlan)
    val mPlan = pipelines.Revalidate.merge(spark, Sf).queryExecution.executedPlan.toString
    assert(!mPlan.contains("CartesianProduct"), mPlan)
  }
}
