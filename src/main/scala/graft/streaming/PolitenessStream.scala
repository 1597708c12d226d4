package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming politeness gate — the STREAM twin of the batch
  * fetch scheduler (X122): an incremental crawler's frontier emits
  * fetch candidates continuously, and the per-host courtesy delay must
  * hold ACROSS micro-batches, which the batch window can't do. State
  * per host is one long — the instant the host is next free — and the
  * recurrence is the serial fold
  *
  *   scheduled(c) = max(ready(c), nextFree)
  *   nextFree     = scheduled(c) + delay(host)
  *
  * over candidates ordered by (ready, url) (the deterministic total
  * order; within a micro-batch the sort makes replays bit-stable).
  *
  * Bounded memory on an unbounded host space: an event-time timeout
  * evicts a host's state once the watermark passes its `nextFree` — at
  * that point the state constrains nothing (every future candidate's
  * `ready` exceeds it), so eviction is semantically free, exactly the
  * [[Sessionize]] discipline.
  *
  * Reference scope: no streaming in the reference; §2.10 north-star
  * machinery. Unit-pinned (streaming — no row oracle possible): the
  * spec replays the same candidates through the serial fold and
  * requires bit-equality, including across micro-batch splits.
  */
object PolitenessStream {

  case class Candidate(host: String, url: String, ready: java.sql.Timestamp,
                       delay_ms: Long)
  case class HostState(nextFreeMs: Long)
  case class Scheduled(host: String, url: String, scheduled: java.sql.Timestamp)

  /** Per-host transition: fold this batch's candidates (sorted) through
    * the next-free instant carried in state.
    */
  def updateSchedule(host: String, it: Iterator[Candidate],
                     state: GroupState[HostState]): Iterator[Scheduled] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val sorted = it.toSeq.sortBy(c => (c.ready.getTime, c.url))
      var free = state.getOption.map(_.nextFreeMs).getOrElse(Long.MinValue)
      val out = sorted.map { c =>
        val t = math.max(c.ready.getTime, free)
        free = t + c.delay_ms
        Scheduled(host, c.url, new java.sql.Timestamp(t))
      }
      state.update(HostState(free))
      // evict once the watermark passes nextFree — the state is inert
      // from then on; clamp above the current watermark (Spark rejects
      // timeouts at or below it)
      state.setTimeoutTimestamp(math.max(free, state.getCurrentWatermarkMs() + 1))
      out.iterator
    }
  }

  /** Watermarked stateful schedule over a candidate stream. */
  def scheduleStream(candidates: Dataset[Candidate],
                     lateness: String = "1 hour"): Dataset[Scheduled] = {
    import candidates.sparkSession.implicits._
    candidates
      .withWatermark("ready", lateness)
      .groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateSchedule)
  }

  /** The serial reference fold (one host) — the contract the stream
    * must replay bit-for-bit regardless of micro-batch boundaries.
    */
  def serialFold(candidates: Seq[Candidate]): Seq[Scheduled] = {
    var free = Long.MinValue
    candidates.sortBy(c => (c.ready.getTime, c.url)).map { c =>
      val t = math.max(c.ready.getTime, free)
      free = t + c.delay_ms
      Scheduled(c.host, c.url, new java.sql.Timestamp(t))
    }
  }
}
