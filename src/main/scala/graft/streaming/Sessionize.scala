package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming: gap-based sessionization of the events stream
  * via `flatMapGroupsWithState` — the `KeyValueGroupedDataset` stateful
  * surface (the one streaming primitive windowed aggregation can't
  * express, since session boundaries depend on per-key event history).
  *
  * Semantics: events for a user belong to one session while consecutive
  * events are ≤ `gap` apart; a quiet period longer than the gap closes the
  * session and emits one summary row. State per key is O(1) (current
  * session bounds + counters), closed sessions leave state immediately,
  * and an event-time timeout evicts idle keys — bounded memory at any
  * throughput, the property that matters on an unbounded 100 TB/day
  * stream.
  *
  * Used in batch tests through the same function — the transform is
  * source-agnostic like [[EventsStream]].
  */
object Sessionize {

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, lastTs: Long, nEvents: Long, valueCents: Long)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  val GapMs: Long = 30 * 60 * 1000L // 30-minute inactivity gap

  /** Per-key state transition. Events arrive in arbitrary order within a
    * micro-batch; they are sorted by time before folding (correct as long
    * as late data stays within the watermark, which drives the timeout).
    */
  def updateSessions(userId: Long, events: Iterator[Event],
                     state: GroupState[SessionState]): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var closed = List.empty[Session]
    var cur = state.getOption

    def close(s: SessionState): Unit =
      closed ::= Session(userId, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.lastTs), s.nEvents,
        s.valueCents.toDouble / 100)

    if (state.hasTimedOut) {
      cur.foreach(close)
      state.remove()
      cur = None
    } else {
      sorted.foreach { e =>
        val t = e.ts.getTime
        val cents = math.floor(e.value * 100).toLong
        cur match {
          case Some(s) if t - s.lastTs <= GapMs =>
            cur = Some(SessionState(s.start, t, s.nEvents + 1, s.valueCents + cents))
          case Some(s) =>
            close(s)
            cur = Some(SessionState(t, t, 1, cents))
          case None =>
            cur = Some(SessionState(t, t, 1, cents))
        }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastTs + GapMs)
        case None => state.remove()
      }
    }
    closed.reverseIterator
  }

  /** Streaming sessionization: watermark bounds lateness, event-time
    * timeout closes idle sessions.
    */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateSessions)
  }

  /** Range join: assign every event to its containing session interval —
    * `user_id` equality carries the join (hash shuffle, no range
    * explosion), the `BETWEEN` rides as a post-join predicate. The classic
    * interval-assignment shape: at scale the equi key bounds each range
    * probe to one user's sessions.
    */
  def assignEventsToSessions(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sessions = sessionizeBatch(spark, dir)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
    graft.Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("ts"))
      .join(sessions, Seq("user_id"))
      .filter(col("ts") >= col("session_start") && col("ts") <= col("session_end"))
      .select(col("event_id"), col("user_id"), col("session_start"),
        col("session_end"), col("n_events"))
  }

  /** DuckDB oracle: the same lag/cumsum sessionization and interval join. */
  def assignOracle: String =
    s"""WITH base AS (
       |  SELECT user_id, ts,
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
       |  FROM events
       |), flagged AS (
       |  SELECT user_id, ts,
       |    CASE WHEN prev_ts IS NULL
       |              OR epoch_ms(ts) - epoch_ms(prev_ts) > $GapMs THEN 1 ELSE 0 END AS new_session
       |  FROM base
       |), numbered AS (
       |  SELECT user_id, ts,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM flagged
       |), sessions AS (
       |  SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       |    count(*) AS n_events
       |  FROM numbered GROUP BY user_id, session_id
       |)
       |SELECT e.event_id, e.user_id, s.session_start, s.session_end, s.n_events
       |FROM events e JOIN sessions s
       |  ON e.user_id = s.user_id
       | AND e.ts >= s.session_start AND e.ts <= s.session_end""".stripMargin

  /** STREAMING twin of [[sessionWindowSummaries]]: the same native
    * `session_window` aggregate over a stream — watermark bounds how long
    * an open session can wait for stragglers; a session emits (append
    * mode) once the watermark passes its close. State per user is the
    * open session's bounds — the built-in form of what
    * [[sessionize]] maintains by hand, kept alongside it because
    * `flatMapGroupsWithState` remains the extension point for semantics
    * session_window cannot express (per-session custom payloads,
    * mid-session emission).
    */
  def sessionWindowStream(events: org.apache.spark.sql.DataFrame,
                          lateness: String = "1 hour"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    events.withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("sw").getField("start").as("session_start"),
        col("n_events"))
  }

  /** Batch sessionization via Spark's NATIVE `session_window` — the
    * idiomatic form of what [[sessionizeBatch]] hand-rolls and the
    * stateful stream computes incrementally. One hash shuffle by
    * `user_id`; merging runs inside each user's sorted group, parallel
    * across users — no global state.
    *
    * Boundary semantics differ from [[GapMs]]'s stateful rule BY DESIGN:
    * session windows are half-open `[start, last_ts + gap)` and merge on
    * OVERLAP, so an event exactly `gap` after the previous one starts a
    * NEW session (the stateful op's `<= GapMs` keeps it). The oracle
    * mirrors the native rule (`>=` break) — fixture timestamps are
    * microsecond-random so the two rules agree there, but the gate pins
    * the native semantic exactly.
    */
  def sessionWindowSummaries(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.ops.ScaleOps.widen(graft.Tables.events(spark, dir))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(col("user_id"),
        col("sw").getField("start").as("session_start"),
        col("sw").getField("end").as("session_end"),
        col("n_events"), col("sum_value_cents"))
  }

  /** DuckDB twin: gaps-and-islands with the native break rule (`>=` gap)
    * and `end = max(ts) + gap`.
    */
  def sessionWindowOracle: String =
    s"""WITH base AS (
       |  SELECT user_id, ts, value,
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
       |  FROM events
       |), flagged AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN prev_ts IS NULL
       |              OR epoch_ms(ts) - epoch_ms(prev_ts) >= $GapMs THEN 1 ELSE 0 END AS brk
       |  FROM base
       |), numbered AS (
       |  SELECT user_id, ts, value,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM flagged
       |)
       |SELECT user_id, min(ts) AS session_start,
       |  max(ts) + INTERVAL '$GapMs' MILLISECOND AS session_end,
       |  count(*) AS n_events,
       |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
       |FROM numbered GROUP BY user_id, sid""".stripMargin

  /** Batch twin over the fixture for cross-checking: classic gap
    * sessionization via lag + cumulative session ids.
    */
  def sessionizeBatch(spark: SparkSession, dir: String): Dataset[Session] = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) > GapMs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (sum(floor(col("value") * 100).cast("long")).cast("double") / 100).as("sum_value"))
      .drop("session_id")
      .as[Session]
  }
}
