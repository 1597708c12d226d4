package graft

import org.apache.spark.sql.functions._
import graft.text.PageMeta

class PageMetaSpec extends SparkSuite {

  test("attribute order tolerated; missing fields NULL; og:title falls back to title") {
    import spark.implicits._
    val html = """<head><title> T </title>
      |<meta content="D" name="description">
      |</head>""".stripMargin
    val r = PageMeta.extract(Seq((1L, html)).toDF("doc_id", "html")).collect()(0)
    assert(r.getAs[String]("title") == "T")
    assert(r.getAs[String]("description") == "D", "flipped attribute order must match")
    assert(r.isNullAt(r.fieldIndex("og_title")) && r.isNullAt(r.fieldIndex("og_image")))
    assert(r.getAs[String]("card_title") == "T", "card falls back to the document title")
    val og = PageMeta.extract(Seq((2L,
      "<head><meta property=\"og:title\" content=\"O\"></head>")).toDF("doc_id", "html"))
      .collect()(0)
    assert(og.getAs[String]("card_title") == "O")
    assert(og.isNullAt(og.fieldIndex("title")))
  }

  test("fixture replay: each rotation class lands its fields") {
    val rows = PageMeta.extracted(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    rows.foreach { case (id, r) =>
      val k = id % 5
      def n(f: String) = Option(r.getAs[String](f))
      assert(n("title") == (if (k <= 2) Some(s"Page $id") else None), s"doc $id title")
      assert(n("description") == (if (k <= 2) Some(s"about ${id % 7}") else None), s"doc $id desc")
      assert(n("og_title") == (if (k == 0 || k == 3) Some(s"OG ${id % 11}") else None), s"doc $id og")
      val card = if (k == 0 || k == 3) Some(s"OG ${id % 11}")
        else if (k <= 2) Some(s"Page $id") else None
      assert(n("card_title") == card, s"doc $id card")
    }
  }

  test("plan is map-only") {
    val plan = PageMeta.extracted(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning") && !plan.contains("Join"), plan)
  }

  test("hreflang: variants cluster on x-default, or the smallest href without one") {
    import spark.implicits._
    val withDefault = """<head>
      |<link rel="alternate" hreflang="x-default" href="http://s/en">
      |<link rel="alternate" hreflang="en" href="http://s/en">
      |<link rel="alternate" hreflang="de" href="http://s/de">
      |</head>""".stripMargin
    val noDefault = """<head>
      |<link rel="alternate" hreflang="pt" href="http://s/pt">
      |<link rel="alternate" hreflang="es" href="http://s/es">
      |<link rel="stylesheet" href="s.css">
      |</head>""".stripMargin
    val got = graft.text.PageMeta.hreflang(
      Seq((1L, withDefault), (2L, noDefault)).toDF("doc_id", "html"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    assert(got.filter(_._1 == 1L).toSet ==
      Set((1L, "en", "http://s/en"), (1L, "de", "http://s/en")),
      "x-default names the cluster; the x-default row itself is dropped")
    assert(got.filter(_._1 == 2L).toSet ==
      Set((2L, "pt", "http://s/es"), (2L, "es", "http://s/es")),
      "without x-default the smallest href leads; decoys are screened")
  }

  test("hreflang fixture: class-0 docs emit 3 variants, class-1 docs 2, others none") {
    val counts = graft.text.PageMeta.hreflangExtracted(spark, Sf)
      .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = Tables.documents(spark, Sf).select("doc_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      (id % 4) match {
        case 0 => assert(counts(id) == 3L, s"doc $id")
        case 1 => assert(counts(id) == 2L, s"doc $id")
        case _ => assert(!counts.contains(id), s"doc $id must emit nothing")
      }
    }
  }
}
