package graft

import org.apache.spark.sql.functions._

class GraftFacadeSpec extends SparkSuite {

  test("dedupCorpus drops exactly the greater side of every near-dup pair") {
    val docs = Tables.documents(spark, Sf)
    val kept = Graft.dedupCorpus(docs)
    val pairs = dedup.Dedup.MinHashLSH.nearDupPairs(spark, Sf)
      .select(col("doc_b")).distinct().count()
    assert(kept.count() === docs.count() - pairs)
  }

  test("analyzeCorpus emits one fully-populated row per document") {
    val out = Graft.analyzeCorpus(Tables.documents(spark, Sf)).cache()
    assert(out.count() === Tables.documents(spark, Sf).count())
    assert(out.filter(col("lang_pred").isNull || col("fp_md5").isNull ||
      col("quality_score").isNull).count() === 0)
  }

  test("approximate search stays within the exact search's result universe") {
    val exact = Graft.searchTopK(spark, Sf).select("query_id", "neighbor_id")
    val approx = Graft.searchTopKApprox(spark, Sf).select("query_id", "neighbor_id")
    assert(approx.count() === exact.count(), "both return K per query")
  }

  test("corpus-prep facade: split covers every doc, report partitions the kept set") {
    val docs = Tables.documents(spark, Sf)
    val split = Graft.splitCorpus(docs).cache()
    assert(split.count() === docs.count())
    assert(split.select("split").distinct().count() <= 3)
    val report = Graft.prepareCorpus(spark, Sf)
      .agg(sum("n_docs")).head().getLong(0)
    assert(report > 0 && report <= docs.count())
    val terms = Graft.topTerms(spark, Sf)
    assert(terms.groupBy("doc_id").count().filter(col("count") > 5).count() === 0)
  }

  test("chunkCorpus emits ordered chunks that reassemble per document") {
    val docs = Tables.documents(spark, Sf).limit(20)
    val rebuilt = Graft.chunkCorpus(docs)
      .groupBy("doc_id")
      .agg(concat_ws("", sort_array(collect_list(struct(col("chunk_idx"), col("chunk"))))
        .getField("chunk")).as("joined"))
    val bad = rebuilt.join(docs, "doc_id").filter(col("joined") =!= col("text")).count()
    assert(bad === 0)
  }

  test("parseTimestamp facade accepts every declared shape") {
    import spark.implicits._
    val ok = Seq("2020-03-15", "2020-03-15T10:20:30", "1584267630000")
      .toDF("s").select(Graft.parseTimestamp(col("s"))).collect()
    assert(ok.forall(!_.isNullAt(0)))
  }

  test("round-7 delegates return rows: analyzer, phrases, quality, semdedup, bpe") {
    assert(Graft.englishAnalyze(spark, Sf).limit(1).count() === 1)
    assert(Graft.phraseBigrams(spark, Sf).limit(1).count() === 1)
    assert(Graft.qualityModelScore(spark, Sf).limit(1).count() === 1)
    assert(Graft.semanticDedup(spark, Sf).limit(1).count() === 1)
    assert(Graft.bpeEncode(spark, Sf).limit(1).count() === 1)
    assert(Graft.docEmbedding(spark, Sf).limit(1).count() === 1)
  }

  test("round-9 crawl delegates return rows and the expected columns") {
    val ing = Graft.crawlIngest(spark, Sf)
    assert(ing.columns.toSeq ==
      Seq("doc_id", "status", "canon", "allowed", "stage", "clean_text"))
    assert(ing.limit(1).count() === 1)
    val sched = Graft.fetchSchedule(spark, Sf)
    assert(sched.columns.toSeq == Seq("doc_id", "host", "seq", "not_before_ms"))
    assert(sched.limit(1).count() === 1)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val h = Seq("HTTP/1.1 200 OK\r\nContent-Type: a/b\r\n\r\nx").toDF("p")
      .select(Graft.httpMessage(col("p")).as("h")).select("h.status").head()
    assert(h.getInt(0) == 200)
    val allowed = Seq(("User-agent: *\nDisallow: /x\n", "/x/y")).toDF("r", "p")
      .select(Graft.robotsAllowed(col("r"), lit("bot"), col("p"))).head()
    assert(allowed.getInt(0) == 0)
    val meta = Seq("Sitemap: https://a/s.xml\nUser-agent: *\nCrawl-delay: 1\n")
      .toDF("r").select(Graft.robotsMeta(col("r"), lit("bot")).as("m"))
      .select("m.crawl_delay_ms").head()
    assert(meta.getInt(0) == 1000)
  }

  test("round-10 frontier delegates return rows and the expected columns") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val today = Seq((1L, "a.com/x"), (3L, "a.com/y")).toDF("doc_id", "url_key")
    val seen = Seq("a.com/x").toDF("url_key")
    assert(Graft.frontierNew(today, seen).collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(Graft.frontierNewBloom(today, seen).collect().map(_.getLong(0)).toSeq == Seq(3L))
    val rec = Graft.frontierRecrawl(spark, Sf)
    assert(rec.columns.toSeq == Seq("doc_id", "url_key", "host", "reason",
      "lastmod", "last_fetch", "seq", "not_before_ms"))
    assert(rec.limit(1).count() === 1)
    val delta = Graft.crawlDelta(spark, Sf)
    assert(delta.columns.toSeq == Seq("url_key", "status", "old_doc", "new_doc"))
    assert(delta.limit(1).count() === 1)
    val red = Graft.redirectResolve(spark, Sf)
    assert(red.columns.toSeq ==
      Seq("doc_id", "url", "final_url", "hops", "final_status"))
    assert(red.limit(1).count() === 1)
    val ents = Graft.sitemapUrlEntries(
      Seq((1L, "<urlset><url><loc>https://a/b&amp;c</loc></url></urlset>"))
        .toDF("doc_id", "xml"))
    assert(ents.select("loc").head().getString(0) == "https://a/b&c")
    val pol = Graft.revisitPolicy(spark, Sf)
    assert(pol.columns.toSeq == Seq("url_key", "obs", "changes", "revisit"))
    assert(pol.limit(1).count() === 1)
  }

  test("round-10 archive-derivation delegates: columns and one-row liveness") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // write + read back one record through the facade surface
    val rec = Seq("payload").toDF("p")
      .select(Graft.warcWriteRecord(lit("response"), lit("http://x/1"), col("p")))
      .head().getString(0)
    assert(rec.startsWith("WARC/1.0\r\n") && rec.contains("Content-Length: 7\r\n"))
    val gzed = Seq("payload").toDF("p")
      .select(Graft.warcWriteGzMember(lit("response"), lit("http://x/1"), col("p")))
      .head().getAs[Array[Byte]](0)
    assert(gzed.length > 2 && (gzed(0) & 0xff) == 0x1f && (gzed(1) & 0xff) == 0x8b)
    val wet = Graft.wetRecords(spark, Sf)
    assert(wet.columns.toSeq == Seq("doc_id", "rec_type", "uri",
      "content_length", "payload", "digest"))
    assert(wet.limit(1).count() === 1)
    val wat = Graft.watRecords(spark, Sf)
    assert(wat.columns.toSeq == Seq("doc_id", "uri", "status", "content_type",
      "n_headers", "n_links", "links", "wat_json"))
    assert(wat.limit(1).count() === 1)
    val cdx = Graft.cdxIndex(spark, Sf)
    assert(cdx.columns.toSeq == Seq("surt", "doc_id", "rn", "shard_id",
      "byte_offset", "rec_bytes", "digest"))
    assert(cdx.limit(1).count() === 1)
    val cf = Graft.cacheFreshness(spark, Sf)
    assert(cf.columns.toSeq == Seq("doc_id", "policy", "ttl_s", "age_s", "fresh"))
    assert(cf.limit(1).count() === 1)
    val rm = Graft.revalidateMerge(spark, Sf)
    assert(rm.columns.toSeq == Seq("url_key", "status", "outcome", "payload", "digest"))
    assert(rm.limit(1).count() === 1)
    val cb = Graft.crawlBudget(spark, Sf)
    assert(cb.columns.toSeq == Seq("host", "n_clean", "alloc"))
    assert(cb.limit(1).count() === 1)
  }

  test("round-12 delegates: whitespace-exact span scrub round-trips and scrubs") {
    import spark.implicits._
    val shared = (0 until 60).map(i => s"s$i").mkString(" ")
    val df = Seq((1L, s"a0\ta1\n$shared  tail1"),
      (2L, s"b0 b1\n\n$shared\ttail2")).toDF("doc_id", "text")
    val out = Graft.scrubExactSpansWs(df).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("a0\ta1\n  tail1", 60L))
    assert(out(2L) == ("b0 b1\n\n\ttail2", 60L))
    val unique = Seq((3L, "x0\n x1\tx2  ")).toDF("doc_id", "text")
    assert(Graft.scrubExactSpansWs(unique).collect()(0).getString(1) == "x0\n x1\tx2  ")
    val model = Graft.qualityTrain(spark, Sf)
    assert(model.columns.toSeq == Seq("slot", "cnt_pos", "cnt_neg", "w"))
    assert(model.limit(1).count() === 1)
    val scored = Graft.qualityScoreDocs(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"),
      model.select(col("slot"), col("w")))
    assert(scored.columns.toSeq == Seq("doc_id", "n_toks", "sum_w", "score_q", "keep"))
    val tree = Graft.htmlTableTree(Seq(
      (1L, "<table><tr><td><table><tr><td>x</td></tr></table></td></tr></table>"))
      .toDF("doc_id", "html"))
    assert(tree.columns.toSeq == Seq("doc_id", "tbl", "depth", "parent", "row",
      "colidx", "header", "cell"))
    assert(tree.count() === 2)
  }

  test("round-13 apply paths: exact dedup, quality reps, span default") {
    import spark.implicits._
    val shared = (0 until 40).map(i => s"w$i").mkString(" ")
    // 1 and 2 are near-identical (share the 40-token body); 2 is LONGER
    // (higher quality score); 3 is unique
    val docs = Seq(
      (1L, shared),
      (2L, s"$shared extra context tokens improving coverage here today"),
      (3L, "entirely different content about something else altogether"))
      .toDF("doc_id", "text")
    // exact path: recall-1 pairs, min-id representative -> keeps 1 and 3
    val exactKept = Graft.dedupCorpusExact(docs, tauBp = 6000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exactKept === Set(1L, 3L))
    // quality path: same cluster, but the HIGHEST-quality member wins
    val q = text.Analysis.qualityQFromTokens(text.TextOps.tokenize(col("text")))
    val qs = docs.select(col("doc_id"), q.as("q")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantRep = if (qs(2L) > qs(1L)) 2L else 1L
    val qualKept = {
      // reuse the exact pair list at the test tau via the library seam
      val pairs = dedup.SetSim.similarityJoin(docs, 6000)
        .select(col("a").as("doc_a"), col("b").as("doc_b"))
      val clusters = dedup.Dedup.Components.of(pairs)
      val reps = dedup.Dedup.repsOf(clusters,
        docs.select(col("doc_id"), q.as("q"))).select("doc_id")
      val drop = clusters.select("doc_id").join(reps, Seq("doc_id"), "left_anti")
      docs.join(drop, Seq("doc_id"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(qualKept === Set(wantRep, 3L))
    // the facade method at the production tau (the pair's jaccard
    // ~0.83 clears 0.8): the quality winner and the unique doc survive
    val facadeKept = Graft.dedupCorpusByQuality(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(facadeKept === Set(wantRep, 3L))
    // span default delegates to the ws-exact scrub: byte-exact identity
    // on a unique corpus, k surfaced
    val unique = Seq((9L, "u0\tu1\n u2")).toDF("doc_id", "text")
    assert(Graft.dedupSpans(unique).collect()(0).getString(1) == "u0\tu1\n u2")
    assert(Graft.dedupSpans(unique, k = 8).columns.toSeq ===
      Seq("doc_id", "clean", "removed_tokens", "n_spans"))
  }

  test("round-13 delegates: columns and one-row liveness") {
    import spark.implicits._
    val one = Seq((1L, "caf\u00C3\u00A9 and scan slow don't stop"))
      .toDF("doc_id", "text")
    val cols = one.select(
      Graft.fixMojibake(col("text")).as("fixed"),
      Graft.charEntropy(col("text")).as("ent"),
      Graft.scrubBlocklist(col("text"), Seq("zz-absent")).as("nohit"),
      Graft.scrubBlocklist(col("text"), Seq("scan slow")).as("scrubbed"),
      Graft.jpegDhash(org.apache.spark.sql.GraftColumnShim.column(
        graft.plans.JpegPlant(org.apache.spark.sql.GraftColumnShim.expression(
          col("doc_id"))))).as("jd"),
      Graft.videoDhash(org.apache.spark.sql.GraftColumnShim.column(
        graft.plans.AviPlant(org.apache.spark.sql.GraftColumnShim.expression(
          col("doc_id"))))).as("vd"),
      Graft.idnAsciiStrict(lit("bücher.example")).as("strict"))
      .collect()(0)
    assert(cols.getString(0).startsWith("caf\u00E9"))
    assert(cols.getStruct(2).getLong(1) == 0L, "absent pattern scrubs nothing")
    assert(cols.getStruct(1).getLong(0) > 0)
    assert(cols.getStruct(3).getLong(1) == 1L, "one phrase scrubbed")
    assert(!cols.isNullAt(4) && !cols.isNullAt(5))
    assert(cols.getString(6) == "xn--bcher-kva.example")
    assert(one.select(posexplode(Graft.bytePretokenize(col("text")))).count() > 3)

    val bitext = Graft.screenBitext(
      Seq((1L, "alpha beta gamma", "alpha beta gamma")).toDF("pair_id", "src", "tgt"))
    assert(bitext.collect()(0).getString(5) == "copy")
    val pref = Graft.preferencePairs(
      Seq((1L, 10L, 2L), (1L, 11L, 0L)).toDF("prompt_id", "cand_id", "rating"))
    assert(pref.collect()(0).getLong(1) == 10L)
    assert(Graft.lengthBatches(spark, Sf).limit(1).count() === 1)
    assert(Graft.attributionLastTouch(spark, Sf).limit(1).count() === 1)
    assert(Graft.sourceRepresentatives(spark, Sf).columns.toSeq ==
      Seq("cluster_id", "doc_id", "source"))
  }

  test("round-14 delegates: codec columns and pair liveness") {
    import spark.implicits._
    val one = Seq(1L).toDF("doc_id")
    val shim = org.apache.spark.sql.GraftColumnShim
    val row = one.select(
      Graft.flacStats(shim.column(graft.plans.FlacPlantWide(
        shim.expression(col("doc_id"))))).as("fs"),
      Graft.flacFingerprint(shim.column(graft.plans.FlacPlantCell(
        shim.expression(col("doc_id")), 1))).as("fp"),
      Graft.zstdText(Graft.zstdStoreBytes(lit("round trip по кругу"))).as("zt"))
      .collect()(0)
    assert(row.getStruct(0).getLong(0) == graft.plans.FlacPlantWide.nOf(1L))
    assert(!row.isNullAt(1))
    assert(row.getString(2) == "round trip по кругу")

    // pair delegates: the planted rescale / resample / trim twins surface
    val rescale = Graft.imageNearDupsRescaled(
      graft.multimodal.ImageHash.plantedDhashScaled(spark, Sf),
      bits = graft.multimodal.ImageHash.RGW * graft.multimodal.ImageHash.RGH)
    assert(rescale.filter(col("hamming") === 0).limit(1).count() == 1)
    assert(Graft.videoNearDupsLong(spark, Sf).limit(1).count() == 1)
    assert(Graft.videoNearDupsTrim(spark, Sf)
      .filter(col("hamming") === 0).limit(1).count() == 1)
    val fp32 = graft.multimodal.AudioSegments
      .fingerprintsCell(spark, Sf, 1, col("doc_id") * 2)
      .unionByName(graft.multimodal.AudioSegments
        .fingerprintsCell(spark, Sf, 2, col("doc_id") * 2 + 1))
    assert(Graft.audioNearDupsResampled(fp32)
      .filter(col("hamming") === 0).limit(1).count() == 1)
    Graft.releaseCaches()
  }
}
