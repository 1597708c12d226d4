package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM interval join (X229, stream side) — the
  * one Structured Streaming feature the streaming surface still
  * lacked (X10 windows against itself, X29 dedups, X15/X146/X174
  * carry keyed state; the dim join in EventsStream is
  * stream-to-STATIC): attribution candidates where the view arrives
  * in one micro-batch and the purchase an hour later in another, so
  * BOTH sides must buffer state and both watermarks bound it.
  *
  *   views(view_id, user_id, vts)  ⋈  purchases(purchase_id,
  *   user_id, pts)  ON  same user AND vts ≤ pts ≤ vts + horizon
  *
  * The time-range predicate is exactly what makes the state BOUNDED
  * (Spark derives each side's eviction point from the other side's
  * watermark plus the interval): an equi-join alone would buffer
  * forever. Emits the same candidate pair set as the batch
  * [[graft.ops.Attribution.candidates]] — spec-pinned across
  * multi-batch splits, including a pair whose sides land in
  * different batches. Last-touch argmax stays a BATCH concern
  * (chaining an aggregate behind a stream-stream join adds a second
  * stateful stage; the production shape materializes candidates and
  * lets the report side pick winners).
  */
object AttributionStream {

  /** Both inputs carry event-time columns; horizon as a SQL interval
    * string (e.g. "1 hour" — keep in lockstep with
    * [[graft.ops.Attribution.HorizonUs]]).
    */
  def candidatePairs(views: DataFrame, purchases: DataFrame,
                     horizon: String = "1 hour"): DataFrame = {
    val v = views.withWatermark("vts", horizon).as("v")
    val p = purchases.withWatermark("pts", horizon).as("p")
    v.join(p,
        expr("v.user_id = p.user_id") &&
          col("p.pts") >= col("v.vts") &&
          col("p.pts") <= col("v.vts") + expr(s"INTERVAL $horizon"))
      .select(col("p.purchase_id"), col("v.user_id"), col("v.view_id"),
        (unix_micros(col("p.pts")) - unix_micros(col("v.vts"))).as("gap_us"))
  }
}
