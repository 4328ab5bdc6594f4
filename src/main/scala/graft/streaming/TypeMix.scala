package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** T12, arbitrary-state v2 with MAP state: per-user event-type
  * histogram via transformWithState's MapState — the state shape for
  * "keyed dictionary" aggregations (per-user per-type counters,
  * per-doc per-shingle tallies) where a ValueState would have to
  * round-trip the whole map on every update. MapState updates touch
  * only the entries a batch actually changes — with the RocksDB
  * provider each (user, type) entry is its own store key, so a user
  * with thousands of types does not rewrite the full histogram per
  * event (the 100 TB reason this exists; contrast [[SpendTracker]]'s
  * single-number ValueState).
  *
  * Emission is deterministic: the types touched in a batch are emitted
  * in sorted order with their updated totals.
  */
object TypeMix {

  case class Event(user_id: Long, event_type: String)
  case class TypeCount(user_id: Long, event_type: String, n: Long)

  class Processor extends StatefulProcessor[Long, Event, TypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[TypeCount] = {
      // fold the batch locally first (one store write per touched type,
      // not per event), then merge into MapState
      val batch = scala.collection.mutable.Map.empty[String, Long]
      rows.foreach(e => batch(e.event_type) = batch.getOrElse(e.event_type, 0L) + 1)
      val updated = batch.toSeq.sortBy(_._1).map { case (t, dn) =>
        val n = (if (counts.containsKey(t)) counts.getValue(t) else 0L) + dn
        counts.updateValue(t, n)
        TypeCount(key, t, n)
      }
      updated.iterator
    }
  }

  /** One updated (user, type, running count) row per touched type per
    * batch, types in sorted order.
    */
  def mix(events: Dataset[Event]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
