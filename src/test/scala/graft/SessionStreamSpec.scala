package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.SessionStream
import graft.streaming.SessionStream.{Event, SessionOut, SessionState}

/** T12 stateful path: flatMapGroupsWithState sessionization — transition
  * function semantics + an end-to-end MemoryStream drive.
  */
class SessionStreamSpec extends GraftSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("advance folds events into gap-bounded sessions") {
    val events = Seq(
      Event(1, ts("2024-01-01 00:00:00"), 1.0),
      Event(1, ts("2024-01-01 00:10:00"), 2.0),
      Event(1, ts("2024-01-01 01:00:00"), 3.0), // 50-min gap -> new session
      Event(1, ts("2024-01-01 01:20:00"), 4.0)
    )
    val (done, open) = SessionStream.advance(None, events)
    assert(done == Seq(SessionOut(1, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 2, 3.0)))
    assert(open.contains(SessionState(ts("2024-01-01 01:00:00"), ts("2024-01-01 01:20:00"), 2, 7.0)))
  }

  test("advance continues an existing open session across batches") {
    val st = SessionState(ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 2, 3.0)
    val (done, open) = SessionStream.advance(Some(st),
      Seq(Event(1, ts("2024-01-01 00:20:00"), 1.0)))
    assert(done.isEmpty)
    assert(open.contains(SessionState(ts("2024-01-01 00:00:00"), ts("2024-01-01 00:20:00"), 3, 4.0)))
  }

  test("advance never moves session bounds backwards on out-of-order events") {
    val st = SessionState(ts("2024-01-01 00:05:00"), ts("2024-01-01 00:10:00"), 2, 3.0)
    // a late event 20 min BEFORE the open end merges without shrinking end
    val (done, open) = SessionStream.advance(Some(st),
      Seq(Event(1, ts("2024-01-01 00:00:00"), 1.0)))
    assert(done.isEmpty)
    assert(open.contains(
      SessionState(ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 3, 4.0)))
  }

  test("streaming sessionization emits closed sessions") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    val stream = MemoryStream[Event]
    val query = SessionStream.sessions(stream.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      stream.addData(
        Event(7, ts("2024-01-01 00:00:00"), 1.0),
        Event(7, ts("2024-01-01 00:05:00"), 2.0),
        // 2h later: closes the first session in the same batch
        Event(7, ts("2024-01-01 02:00:00"), 5.0))
      query.processAllAvailable()
      val got = sp.sql("SELECT user_id, n_events, total_value FROM sessions_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set((7L, 2L, 3.0)))

      // advance the watermark past the open session's gap: the trailing
      // session (1 event @02:00) must now emit via event-time timeout
      stream.addData(Event(8, ts("2024-01-01 09:00:00"), 0.5))
      query.processAllAvailable()
      stream.addData(Event(8, ts("2024-01-01 09:01:00"), 0.5))
      query.processAllAvailable()
      val got2 = sp.sql("SELECT user_id, n_events, total_value FROM sessions_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got2.contains((7L, 1L, 5.0)), got2)
    } finally query.stop()
  }
}
