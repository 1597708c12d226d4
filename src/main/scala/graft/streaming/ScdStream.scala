package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming SCD-2 — the STREAM twin of the batch dimension
  * build (X193 `ops.Scd.scd2`): attribute-change tracking is the
  * canonical "the change arrives in a later micro-batch" workload.
  * State per entity is its OPEN version (attr, since, version); each
  * batch folds its slice in (event-time, event_id) order through the
  * same recurrence as the batch operator: a differing attribute CLOSES
  * the open version (emitted, Append-mode — closed rows are immutable,
  * so downstream appends are correct) and opens the next.
  *
  * Bounded memory on an unbounded entity space: an entity idle past
  * `last-change + [[IdleTtlUs]]` has its open version EMITTED with
  * valid_to null (the retire row — exactly the open row the batch
  * operator reports) and its state evicted via event-time timeout —
  * the FunnelStream eviction discipline. A change arriving after
  * retirement re-opens at version 1 of a fresh lineage; callers
  * needing unbroken lineage choose the TTL.
  *
  * Declared scope (the FunnelStream contract): within-batch order is
  * restored by sorting; cross-batch reordering inside the lateness
  * allowance folds in arrival order — set lateness to "0 seconds" for
  * bit-equality with the batch operator under adversarial reordering.
  *
  * Reference scope: no streaming in the reference; §2.10 north-star
  * machinery. Unit-pinned (streaming state — no row oracle possible):
  * the spec replays the same events through the batch operator and
  * requires the closed-version rows to match exactly across
  * micro-batch splits, and retire rows to complete the dimension.
  */
object ScdStream {

  /** Retire an entity after 30 event-time days without a change. */
  val IdleTtlUs: Long = 30L * 86400L * 1000000L

  case class Ev(event_id: Long, user_id: Long, event_type: String,
                ts: java.sql.Timestamp)
  case class ScdState(attr: String, since: Long, version: Int)
  case class VersionRow(user_id: Long, attr: String, valid_from: Long,
                        valid_to: Option[Long], version: Int)

  def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  def updateScd(user: Long, it: Iterator[Ev],
                state: GroupState[ScdState]): Iterator[VersionRow] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      Iterator.single(VersionRow(user, st.attr, st.since, None, st.version))
    } else {
      val out = scala.collection.mutable.ArrayBuffer.empty[VersionRow]
      var st = state.getOption.orNull
      it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val us = micros(e.ts)
        if (st == null) st = ScdState(e.event_type, us, 1)
        else if (e.event_type != st.attr) {
          out += VersionRow(user, st.attr, st.since, Some(us), st.version)
          st = ScdState(e.event_type, us, st.version + 1)
        }
      }
      if (st != null) {
        state.update(st)
        val retireMs = st.since / 1000L + IdleTtlUs / 1000L
        state.setTimeoutTimestamp(math.max(retireMs, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }
  }

  /** Watermarked stateful SCD-2 over an event stream: closed versions
    * as they happen, retire rows (valid_to null) at TTL.
    */
  def scdStream(events: Dataset[Ev], lateness: String = "1 hour"): Dataset[VersionRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateScd)
  }
}
