package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.SpendTracker
import graft.streaming.SpendTracker.Purchase

/** T12 arbitrary-state v2: transformWithState (Spark 4 StatefulProcessor)
  * end-to-end on a MemoryStream, including cross-batch state carry.
  * Requires the RocksDB state store provider — set per-test and restored.
  */
class SpendTrackerSpec extends GraftSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("transformWithState sessions close via event-time timers, matching v1") {
    import java.sql.Timestamp
    import graft.streaming.{SessionStream, SessionStreamV2}
    def ts(s: String) = Timestamp.valueOf(s)
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    val before = sp.conf.getOption(providerKey)
    sp.conf.set(providerKey, rocksDb)
    val stream = MemoryStream[SessionStream.Event]
    val query = SessionStreamV2.sessions(stream.toDS())
      .writeStream.format("memory").queryName("sessions_v2")
      .outputMode("append").start()
    try {
      stream.addData(
        SessionStream.Event(7, ts("2024-01-01 00:00:00"), 1.0),
        SessionStream.Event(7, ts("2024-01-01 00:05:00"), 2.0),
        // 2h later: closes the first session within the same batch
        SessionStream.Event(7, ts("2024-01-01 02:00:00"), 5.0))
      query.processAllAvailable()
      val got = sp.sql("SELECT user_id, n_events, total_value FROM sessions_v2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set((7L, 2L, 3.0)), got)

      // watermark passes the open session's gap → the TIMER closes it
      stream.addData(SessionStream.Event(8, ts("2024-01-01 09:00:00"), 0.5))
      query.processAllAvailable()
      stream.addData(SessionStream.Event(8, ts("2024-01-01 09:01:00"), 0.5))
      query.processAllAvailable()
      val got2 = sp.sql("SELECT user_id, n_events, total_value FROM sessions_v2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got2.contains((7L, 1L, 5.0)), got2)
    } finally {
      query.stop()
      before match {
        case Some(v) => sp.conf.set(providerKey, v)
        case None => sp.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState folds per-user spend across micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    val before = sp.conf.getOption(providerKey)
    sp.conf.set(providerKey, rocksDb)
    val stream = MemoryStream[Purchase]
    val query = SpendTracker.totals(stream.toDS())
      .writeStream.format("memory").queryName("spend_out")
      .outputMode("update").start()
    try {
      stream.addData(Purchase(1, 10.0), Purchase(1, 5.0), Purchase(2, 7.0))
      query.processAllAvailable()
      val b1 = sp.sql("SELECT * FROM spend_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(b1 == Set((1L, 2L, 15.0), (2L, 1L, 7.0)), b1)

      // second batch: state must carry — user 1 continues from (2, 15.0)
      stream.addData(Purchase(1, 1.0), Purchase(3, 2.5))
      query.processAllAvailable()
      val b2 = sp.sql("SELECT * FROM spend_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(b2.contains((1L, 3L, 16.0)), b2)
      assert(b2.contains((3L, 1L, 2.5)), b2)
    } finally {
      query.stop()
      before match {
        case Some(v) => sp.conf.set(providerKey, v)
        case None => sp.conf.unset(providerKey)
      }
    }
  }

  test("per-key spend is bit-identical regardless of within-batch arrival order") {
    // round-6 determinism fix: the fold sorts a key's batch rows before
    // accumulating, so double-addition order can't vary across reruns.
    // Values chosen so a different addition order WOULD change the ulp:
    // (1e16 + 1) + 1 == 1e16 in IEEE double, but 1 + 1 + 1e16 keeps both.
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val before = sp.conf.getOption(providerKey)
    sp.conf.set(providerKey, rocksDb)

    def run(purchases: Seq[Purchase], name: String): Double = {
      val stream = MemoryStream[Purchase]
      val query = SpendTracker.totals(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        stream.addData(purchases: _*)
        query.processAllAvailable()
        sp.sql(s"SELECT total_spend FROM $name WHERE user_id = 9")
          .head().getDouble(0)
      } finally query.stop()
    }
    try {
      val vals = Seq(Purchase(9, 1e16), Purchase(9, 1.0), Purchase(9, 1.0))
      val a = run(vals, "spend_fwd")
      val b = run(vals.reverse, "spend_rev")
      assert(a == b, s"arrival order changed the total: $a vs $b")
      // the exact fold loses no units to double-addition order
      assert(a == 1e16 + 2.0, a.toString)
      // non-finite amounts must not kill the query (the exact fold
      // routes them around the BigDecimal) and must propagate IEEE-style
      val inf = run(Seq(Purchase(9, 5.0), Purchase(9, Double.PositiveInfinity)),
        "spend_inf")
      assert(inf.isPosInfinity, inf.toString)
      val nan = run(Seq(Purchase(9, Double.NaN), Purchase(9, 5.0)), "spend_nan")
      assert(nan.isNaN, nan.toString)
    } finally {
      before match {
        case Some(v) => sp.conf.set(providerKey, v)
        case None => sp.conf.unset(providerKey)
      }
    }
  }
}
