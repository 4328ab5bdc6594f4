package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import SessionStream.{Event, SessionOut, SessionState, advance, GapMs}

/** T12: gap-session assembly on the transformWithState API — the
  * arbitrary-state-v2 twin of [[SessionStream]] (flatMapGroupsWithState),
  * sharing the SAME pure transition function `advance`, so both
  * implementations provably compute identical sessions.
  *
  * What v2 adds over v1 here: the session-close deadline is a REGISTERED
  * EVENT-TIME TIMER (one per key, re-registered as the open session
  * extends) and the close itself happens in `handleExpiredTimer` when the
  * watermark passes end+gap — instead of v1's single timeout slot folded
  * into the same callback. State is one SessionState per key on the
  * RocksDB provider; at 100 TB/day the timer index and the state shard
  * together across executors.
  */
object SessionStreamV2 {

  class Processor extends StatefulProcessor[Long, Event, SessionOut] {
    @transient private var open: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionState]("open",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val existing = if (open.exists()) Some(open.get()) else None
      val (done, stillOpen) = advance(existing, rows.toSeq)
      stillOpen match {
        case Some(st) =>
          open.update(st)
          // one deadline per key: drop the stale timer, arm the new one
          // strictly beyond the current watermark so it can still fire
          getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
          getHandle.registerTimer(
            math.max(st.end.getTime + GapMs, timerValues.getCurrentWatermarkInMs() + 1))
        case None =>
          // no open session: clear state AND disarm any timer registered
          // for the previous session, so a leftover timer can never fire
          // against a future session opened later for this key
          open.clear()
          getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      }
      done.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (open.exists()) {
        val st = open.get()
        // a stale timer (armed for an older deadline than the open
        // session's current one) must not close the session early — only
        // honor timers at or past the live deadline
        if (expiredTimerInfo.getExpiryTimeInMs() >= st.end.getTime + GapMs) {
          open.clear()
          Iterator.single(SessionOut(key, st.start, st.end, st.nEvents, st.totalValue))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** Wire the v2 sessionizer onto any streaming Dataset[Event]. */
  def sessions(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.EventTime(), OutputMode.Append())
  }
}
