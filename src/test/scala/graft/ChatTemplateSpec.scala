package graft

import org.apache.spark.sql.functions._
import graft.text.ChatTemplate

class ChatTemplateSpec extends SparkSuite {

  private def messages = {
    import spark.implicits._
    Seq(
      (1L, 0, "system", "You are terse."),
      (1L, 1, "user", "hi there"),
      (1L, 2, "assistant", "hello"),
      (1L, 3, "user", "bye"),
      (1L, 4, "assistant", "farewell friend"),
      (2L, 1, "user", "lonely question"), // no assistant turn at all
      (3L, 1, "assistant", "unprompted")  // assistant-first conversation
    ).toDF("conv_id", "turn_idx", "role", "content")
  }

  test("render concatenates blocks in turn order with the fixed template") {
    val r = ChatTemplate.render(messages).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getString(2))).toMap
    assert(r(1L)._1 == 5L)
    assert(r(1L)._2 ==
      "<|system|>\nYou are terse.<|end|>\n" +
      "<|user|>\nhi there<|end|>\n" +
      "<|assistant|>\nhello<|end|>\n" +
      "<|user|>\nbye<|end|>\n" +
      "<|assistant|>\nfarewell friend<|end|>\n")
    assert(r(2L)._2 == "<|user|>\nlonely question<|end|>\n")
    assert(r(3L)._2 == "<|assistant|>\nunprompted<|end|>\n")
  }

  test("loss spans round-trip: substring(rendered, start, end) == content, assistant only") {
    val rendered = ChatTemplate.render(messages)
      .select(col("conv_id"), col("rendered"))
    val spans = ChatTemplate.lossSpans(messages)
    // conv 2 has no assistant turn -> absent
    assert(spans.filter(col("conv_id") === 2L).count() == 0L)
    val joined = spans.join(rendered, Seq("conv_id"))
      .join(messages.select(col("conv_id"),
        col("turn_idx").cast("long").as("turn_idx"), col("content")),
        Seq("conv_id", "turn_idx"))
      .select(col("content"),
        expr("substring(rendered, cast(start as int) + 1, cast(end - start as int))")
          .as("cut"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getString(1) == r.getString(0)))
  }

  test("planted fixture round-trips on every assistant turn at sf0.001") {
    val docs = graft.Tables.documents(spark, Sf).select(col("doc_id"))
    val msgs = ChatTemplate.plantMessages(docs)
    val bad = ChatTemplate.lossSpans(msgs)
      .join(ChatTemplate.render(msgs), Seq("conv_id"))
      .join(msgs.select(col("conv_id"),
        col("turn_idx").cast("long").as("turn_idx"), col("content")),
        Seq("conv_id", "turn_idx"))
      .filter(expr("substring(rendered, cast(start as int) + 1, cast(end - start as int))")
        =!= col("content"))
      .count()
    assert(bad == 0L)
  }
}
