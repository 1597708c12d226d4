package graft

import org.apache.spark.sql.functions._
import graft.text.Feeds

class FeedsSpec extends SparkSuite {

  private lazy val rows = Feeds.extracted(spark, Sf).collect()
    .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("idx")) -> r).toMap

  test("entry counts follow 1 + doc_id % 3; dialect follows parity") {
    val ids = rows.keySet.map(_._1)
    assert(ids.nonEmpty)
    ids.foreach { id =>
      val n = rows.keySet.count(_._1 == id)
      assert(n == 1 + (id % 3).toInt, s"doc $id entry count")
      val fmt = rows((id, 0)).getAs[String]("format")
      assert(fmt == (if (id % 2 == 0) "rss" else "atom"), s"doc $id dialect")
    }
  }

  test("links decode &amp; and follow the dialect's grammar (element text vs href attr)") {
    rows.foreach { case ((id, idx), r) =>
      val link = r.getAs[String]("link")
      val dialect = if (id % 2 == 0) "rss" else "atom"
      assert(link ==
        s"https://site${id % 23}.example.com/$dialect/$id/p${idx + 1}?s=1&t=2",
        s"doc $id idx $idx")
      assert(r.getAs[String]("title") == s"Post $id-${idx + 1}")
    }
  }

  test("published_epoch: RFC 822 pubDate and RFC 3339 updated normalize to the SAME instant") {
    // both dialects plant the identical (day, hour, minute) arithmetic, so
    // an rss doc and an atom doc agreeing on (id mod the drivers) must
    // yield equal epochs — the cross-format normalization contract
    rows.foreach { case ((id, idx), r) =>
      val i = idx + 1
      val expected: Option[Long] =
        if ((id + i) % 4 == 1) None
        else {
          val day = (id + i) % 9 + 1
          val hour = id % 24
          val min = (id * 7 + i) % 60
          // 2025-08-01T00:00:00Z = 1754006400
          Some(1754006400L + (day - 1) * 86400L + hour * 3600L + min * 60L)
        }
      val got = if (r.isNullAt(r.fieldIndex("published_epoch"))) None
        else Some(r.getAs[Long]("published_epoch"))
      assert(got == expected, s"doc $id idx $idx")
    }
  }

  test("plan is map-only: no shuffle beyond the deliberate widen, no join") {
    val plan = Feeds.extracted(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("autodiscovery: attribute order tolerated, decoys screened, hrefs resolved") {
    import spark.implicits._
    val html = """<head>
      |<link rel="stylesheet" href="style.css">
      |<link href="rss/3.xml" type="application/rss+xml" rel="alternate">
      |<link rel="alternate" type="application/atom+xml" href="/a.atom">
      |</head>""".stripMargin
    val got = Feeds.autodiscover(
      Seq((1L, "http://x.example.com/blog/9/post", html)).toDF("doc_id", "base", "html"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("http://x.example.com/blog/9/rss/3.xml", "rss"),
      ("http://x.example.com/a.atom", "atom")))
  }

  test("autodiscovery fixture: feedless pages emit nothing; every other page exactly one feed") {
    val byDoc = Feeds.autodiscovered(spark, Sf).groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = Tables.documents(spark, Sf).select("doc_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      if (id % 4 == 3) assert(!byDoc.contains(id), s"doc $id is feedless")
      else assert(byDoc(id) == 1L, s"doc $id")
    }
  }

  test("dialect sniff keys off the root element, not the fixture rotation") {
    import spark.implicits._
    val atomXml = "<?xml version=\"1.0\"?>\n<feed>\n<entry>\n" +
      "<title>T</title>\n<link href=\"https://a/x\"/>\n" +
      "<updated>2025-08-02T03:04:00Z</updated>\n</entry>\n</feed>"
    val got = Feeds.entries(Seq((2L, atomXml)).toDF("doc_id", "xml")).collect()(0)
    assert(got.getAs[String]("format") == "atom") // even id, atom payload
    assert(got.getAs[String]("link") == "https://a/x")
    assert(got.getAs[Long]("published_epoch") ==
      1754006400L + 86400L + 3 * 3600L + 4 * 60L)
  }
}
