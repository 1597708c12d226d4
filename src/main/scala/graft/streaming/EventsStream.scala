package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Events

/** Structured Streaming twin of [[graft.ops.Events.hourlyJsonAgg]].
  *
  * The reference is pure batch (SURVEY §2.10) — its closest analogue is the
  * incremental month-bucket loop. This module is the thin streaming demo
  * that shape implies: the SAME transformation applied to an unbounded
  * source via `readStream`, with a watermark bounding the window state.
  *
  * The transform is source-agnostic (works on `MemoryStream`, file source,
  * or Kafka alike): parse JSON props → 1-hour tumbling window with a
  * 2-hour watermark → count/sum per (window, event_type). State per key is
  * O(1) and evicted once the watermark passes the window end, so the
  * streaming job's memory is bounded by (hours in flight × event types) —
  * safe at any throughput.
  */
object EventsStream {

  /** Apply the windowed JSON aggregation to a STREAMING DataFrame with
    * schema (ts timestamp, event_type string, value double, props string).
    */
  def hourlyJsonAggStream(events: DataFrame): DataFrame =
    events
      .select(
        col("ts"), col("event_type"),
        from_json(col("props"), Events.PropsSchema).getField("k").as("k"),
        floor(col("value") * 100).cast("long").as("value_cents"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        sum(col("value_cents")).as("sum_value_cents"))
      .select(col("window").getField("start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_k"),
        (col("sum_value_cents").cast("double") / 100).as("sum_value"))

  /** Stream-static enrichment join: each micro-batch of the stream joins
    * the static dimension — Spark plans this as a broadcast per batch
    * with NO streaming state (the static side is not stateful), so it
    * scales with the dimension size, not the stream history. The
    * streaming analog of the star-join dimension lookups.
    */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left_outer")

  /** Streaming upsert sink — the reference's ES `upsert`+append write
    * (`snowflake_to_es_etl.py:234-241`) as a stream: every micro-batch
    * merges into the keyed table via `foreachBatch` +
    * [[graft.sources.Sinks.writeMerged]], so the stored table always
    * holds last-writer-wins rows per key. At scale, swap in
    * `writeMergedPartitioned` to bound each batch's rewrite to its
    * touched partitions.
    */
  def streamMergeByKey(events: DataFrame, key: String, version: String,
                       path: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      graft.sources.Sinks.writeMerged(batch.sparkSession, batch, key, version, path)
    }

  /** Streaming twin of the EXACT-dedup family: drop re-deliveries of the
    * same key within the watermark horizon via
    * `dropDuplicatesWithinWatermark` — the Spark-native streaming dedup.
    *
    * Unlike plain `dropDuplicates` on a stream (whose key state grows
    * without bound), the within-watermark form evicts each key's state
    * once the watermark passes its last-seen event time, so state is
    * O(keys per horizon) — the only formulation that survives an
    * unbounded 100 TB/day feed. Exactly-once per key is guaranteed only
    * for duplicates arriving closer together than the horizon, which is
    * the at-least-once-delivery contract this operator exists to clean.
    */
  def dedupStream(events: DataFrame, key: String, horizon: String = "2 hours"): DataFrame =
    events.withWatermark("ts", horizon).dropDuplicatesWithinWatermark(key)
}
