package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming funnel — the STREAM twin of the batch
  * view→click→purchase funnel (X172 `Events.funnel`): conversion
  * tracking is the canonical "state that must survive micro-batch
  * boundaries" workload (the view arrives in one batch, the click an
  * hour later in another). State per user is three optional instants —
  * first view, first qualifying click, first qualifying purchase — and
  * each batch folds its events through the SAME recurrence as the
  * batch operator: a hop counts only strictly AFTER the previous
  * stage's first qualifying event and within [[HorizonUs]] of it.
  *
  * Emission is Append-mode stage TRANSITIONS — one row per (user,
  * stage) the first time the user reaches it — so downstream counts
  * are additive per micro-batch and the final per-user stage is the
  * max over emitted rows.
  *
  * Bounded memory on an unbounded user space: once the watermark
  * passes `first-view + 2·horizon`, no future event can advance the
  * funnel (each hop's window is anchored at or before that bound), so
  * the event-time timeout evicts the state — the [[PolitenessStream]]
  * discipline.
  *
  * Declared scope: per-user event-time order within each batch is
  * restored by sorting, and batches are assumed watermark-ordered
  * across batches (standard Append semantics); a late event beyond the
  * watermark is dropped by the watermark itself. DECLARED DIVERGENCE
  * (pinned in FunnelStreamSpec): an event that is within the lateness
  * allowance but event-time EARLIER than events already folded in a
  * previous micro-batch (e.g. an earlier first view arriving one batch
  * after the click it would have qualified) is folded in arrival
  * order, not event order — the fold is monotone (`tv` is never
  * retroactively lowered), so the stream may settle one stage LOWER
  * than the serial recurrence for such users. Callers needing
  * bit-equality with the batch operator under cross-batch reordering
  * should set `lateness = "0 seconds"` so the watermark itself
  * enforces the ordering assumption.
  *
  * Reference scope: no streaming in the reference; §2.10 north-star
  * machinery. Unit-pinned (streaming — no row oracle possible): the
  * spec replays the same events through [[Events.funnel]]'s serial
  * recurrence and requires identical final stages, including across
  * micro-batch splits.
  */
object FunnelStream {

  /** Same per-hop window as the batch funnel, in microseconds. */
  val HorizonUs: Long = graft.ops.Events.FunnelHorizonUs

  case class Ev(user_id: Long, event_type: String, ts: java.sql.Timestamp)
  case class FunnelState(tv: Long, tc: Long, tp: Long) // Long.MinValue = unset
  case class StageReached(user_id: Long, stage: Int, at: java.sql.Timestamp)

  private val Unset = Long.MinValue

  /** Exact epoch micros — `getTime` alone drops sub-millisecond
    * precision, and the batch operator compares exact micros.
    */
  def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  /** Fold one user's batch slice through the funnel recurrence. */
  def updateFunnel(user: Long, it: Iterator[Ev],
                   state: GroupState[FunnelState]): Iterator[StageReached] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var st = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset))
      val out = scala.collection.mutable.ArrayBuffer.empty[StageReached]
      // restore event-time order within the batch slice; ties break by
      // type so replays are bit-stable
      it.toSeq.sortBy(e => (micros(e.ts), e.event_type)).foreach { e =>
        val us = micros(e.ts)
        e.event_type match {
          case "view" if st.tv == Unset =>
            st = st.copy(tv = us)
            out += StageReached(user, 1, e.ts)
          case "click" if st.tv != Unset && st.tc == Unset
            && us > st.tv && us <= st.tv + HorizonUs =>
            st = st.copy(tc = us)
            out += StageReached(user, 2, e.ts)
          case "purchase" if st.tc != Unset && st.tp == Unset
            && us > st.tc && us <= st.tc + HorizonUs =>
            st = st.copy(tp = us)
            out += StageReached(user, 3, e.ts)
          case _ => ()
        }
      }
      if (st.tv == Unset) {
        // still no view (click/purchase-only user — untracked views,
        // bots): nothing to anchor a timeout on, so storing the
        // all-Unset state would leak forever. Keep NO state; the
        // funnel can only start at a future view, which re-creates it.
        if (state.exists) state.remove()
      } else {
        state.update(st)
        // after first-view + 2 horizons nothing can advance the funnel
        val doneMs = st.tv / 1000L + 2L * (HorizonUs / 1000L)
        state.setTimeoutTimestamp(math.max(doneMs, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }
  }

  /** Watermarked stateful funnel over an event stream. */
  def funnelStream(events: Dataset[Ev], lateness: String = "1 hour"): Dataset[StageReached] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateFunnel)
  }

  /** The serial reference fold (one user) — what the stream must
    * replay regardless of micro-batch boundaries: the final stage
    * reached over the ordered events.
    */
  def serialStage(events: Seq[Ev]): Int = {
    var tv, tc, tp = Unset
    events.sortBy(e => (micros(e.ts), e.event_type)).foreach { e =>
      val us = micros(e.ts)
      e.event_type match {
        case "view" if tv == Unset => tv = us
        case "click" if tv != Unset && tc == Unset
          && us > tv && us <= tv + HorizonUs => tc = us
        case "purchase" if tc != Unset && tp == Unset
          && us > tc && us <= tc + HorizonUs => tp = us
        case _ => ()
      }
    }
    if (tp != Unset) 3 else if (tc != Unset) 2 else if (tv != Unset) 1 else 0
  }
}
