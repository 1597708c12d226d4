package graft

import org.apache.spark.sql.functions._

import graft.text.Confusables

class ConfusablesSpec extends SparkSuite {

  import spark.implicits._

  test("fold table is well-formed: same length, every target is lowercase Latin") {
    assert(Confusables.FoldFrom.length == Confusables.FoldTo.length)
    assert(Confusables.FoldTo.forall(c => c >= 'a' && c <= 'z'))
    // every source char really is non-Latin (a Latin char in the from
    // side would silently rewrite legitimate hosts)
    assert(Confusables.FoldFrom.forall(c =>
      Character.UnicodeScript.of(c.toInt) != Character.UnicodeScript.LATIN))
    assert(Confusables.FoldFrom.toSet.size == Confusables.FoldFrom.length, "no dup folds")
  }

  private def screen(hosts: (Long, String)*): Map[Long, (String, Boolean, Boolean)] =
    Confusables.screen(hosts.toSeq.toDF("doc_id", "host"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getBoolean(3), r.getBoolean(4)))).toMap

  test("the Cyrillic-a paypal spoof folds to the brand and flags; the brand itself never does") {
    val out = screen((1L, "pаypаl.com"), (2L, "paypal.com"))
    assert(out(1L) == (("paypal.com", true, true)))
    assert(out(2L) == (("paypal.com", false, false)))
  }

  test("a pure-script IDN host is legitimate: folded maybe, flagged never") {
    val out = screen((1L, "почта.ru"))
    assert(!out(1L)._2, "single-script host must not read as mixed")
    assert(!out(1L)._3)
  }

  test("mixed-script non-brand is mixed but not a spoof") {
    val out = screen((1L, "wіki.org"))
    assert(out(1L) == (("wiki.org", true, false)))
  }

  test("greek omicron spoof of google flags") {
    val out = screen((1L, "gοοgle.com"))
    assert(out(1L) == (("google.com", true, true)))
  }
}
