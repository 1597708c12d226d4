package graft

import org.apache.spark.sql.functions._
import graft.ops.CorpusOps
import graft.text.Redact

class SampleRedactSpec extends SparkSuite {

  test("stratifiedSample is deterministic, per-language rated, and keeps all of a 100% stratum") {
    val docs = Tables.documents(spark, Sf)
    val s1 = CorpusOps.stratifiedSample(docs).collect().map(_.getLong(0)).sorted.toSeq
    val s2 = CorpusOps.stratifiedSample(docs).collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 == s2, "same corpus must sample identically on every run")
    val byLang = CorpusOps.stratifiedSample(docs).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = CorpusOps.SampleRates.toMap
    for ((lang, n) <- total) {
      val pct = rates.getOrElse(lang, CorpusOps.DefaultSamplePct)
      val kept = byLang.getOrElse(lang, 0L).toDouble / n
      if (pct == 100) assert(kept == 1.0, s"$lang: a 100% stratum keeps every row")
      else assert(math.abs(kept - pct / 100.0) < 0.2,
        s"$lang: kept ${kept}, want ~${pct / 100.0}")
    }
  }

  test("sample hash is decorrelated from the split hash") {
    // with the split's own hash every sampled zh/es doc (pct 25) would sit
    // in split buckets 0-24 ⊂ train; the salt must break that
    val docs = Tables.documents(spark, Sf)
    val joined = CorpusOps.stratifiedSample(docs)
      .join(CorpusOps.stratifiedSplit(docs), "doc_id")
      .filter(col("sample_pct") < 100)
    val splits = joined.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.contains("test") || splits.contains("val"),
      "a <100% sample must still contain non-train documents")
  }

  test("redaction replaces emails, phones and IPv4s and counts them on the original") {
    import spark.implicits._
    val df = Seq(
      (1L, "write bob.smith+x@mail.example.org or call +1 555-123-4567 now"),
      (2L, "server at 192.168.0.17 responded"),
      (3L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Redact.redact(col("text")).as("r")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "write <EMAIL> or call <PHONE> now")
    assert(out(2L) == "server at <IP> responded")
    assert(out(3L) == "nothing sensitive here at all")
  }

  test("redactionReport plants and redacts deterministically over the fixture") {
    val rep = Redact.redactionReport(spark, Sf).cache()
    val planted = rep.filter(col("doc_id") % 3 === 0)
    assert(planted.filter(col("n_emails") === 0).count() == 0,
      "every %3 doc gains exactly its planted email")
    assert(planted.filter(!col("red_text").contains("<EMAIL>")).count() == 0)
    assert(rep.filter(col("doc_id") % 105 === 1).filter(
      col("n_emails") + col("n_phones") + col("n_ips") =!= 0).count() == 0,
      "docs with no planted PII redact nothing (word-soup fixture)")
    rep.unpersist()
    ()
  }
}
