package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (SURVEY.md §2.3 T12 — the streaming
  * twin of the batch q11_sessionize gap-session operator).
  *
  * flatMapGroupsWithState keeps one [[SessionState]] per user in the
  * state store; a 30-minute event-time gap (enforced via processing
  * timeout on the keyed state) closes the session and emits it. State is
  * keyed by user_id — high cardinality, so at 100 TB/day the store
  * shards across executors and each entry is O(1) in size (no event
  * buffering; only the running aggregate).
  */
object SessionStream {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Timestamp, end: Timestamp, nEvents: Long, totalValue: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  val GapMs: Long = 30 * 60 * 1000L

  /** Pure transition: fold a batch of events for one user into completed
    * sessions + the still-open tail. Shared by streaming and tests.
    */
  def advance(existing: Option[SessionState], events: Seq[Event]): (Seq[SessionOut], Option[SessionState]) = {
    val sorted = events.sortBy(e => (e.ts.getTime, e.value))
    var open = existing
    val done = Seq.newBuilder[SessionOut]
    var userId = 0L
    sorted.foreach { e =>
      userId = e.user_id
      open match {
        case Some(st) if e.ts.getTime - st.end.getTime <= GapMs =>
          // cross-batch out-of-order events may arrive before the open
          // session's bounds — only ever WIDEN the window, never move
          // end (or start) backwards
          open = Some(st.copy(
            start = if (e.ts.before(st.start)) e.ts else st.start,
            end = if (e.ts.after(st.end)) e.ts else st.end,
            nEvents = st.nEvents + 1,
            totalValue = st.totalValue + e.value))
        case Some(st) =>
          done += SessionOut(e.user_id, st.start, st.end, st.nEvents, st.totalValue)
          open = Some(SessionState(e.ts, e.ts, 1, e.value))
        case None =>
          open = Some(SessionState(e.ts, e.ts, 1, e.value))
      }
    }
    (done.result(), open)
  }

  def sessionFn(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      Iterator.single(SessionOut(userId, st.start, st.end, st.nEvents, st.totalValue))
    } else {
      val (done, open) = advance(state.getOption, events.toSeq)
      open match {
        case Some(st) =>
          state.update(st)
          // event-time timeout: the session closes when the WATERMARK
          // passes end+gap — deterministic, driven by data not wall-clock
          state.setTimeoutTimestamp(
            math.max(st.end.getTime + GapMs, state.getCurrentWatermarkMs() + 1))
        case None => state.remove()
      }
      done.iterator
    }
  }

  /** Wire the stateful sessionizer onto any streaming Dataset[Event]. */
  def sessions(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(sessionFn)
  }
}
