package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** T12, arbitrary-state v2: per-user running spend via Spark 4's
  * transformWithState — the successor API to [[SessionStream]]'s
  * flatMapGroupsWithState, with named state variables (ValueState /
  * ListState / MapState), per-state TTL, and timers as first-class
  * handles. Demonstrated here as the streaming twin of a running keyed
  * aggregate: each micro-batch folds a user's purchases into one
  * ValueState entry and emits the updated total.
  *
  * Scale shape: state is keyed by user_id (high cardinality → shards
  * across executors); each entry is O(1) — two numbers, no event
  * buffering. transformWithState requires the RocksDB state store
  * provider, which is also the right provider at 100 TB: state lives
  * off-heap/on-disk with incremental changelog checkpointing, so a
  * billion-key store does not live on the JVM heap.
  */
object SpendTracker {

  case class Purchase(user_id: Long, amount: Double)
  case class SpendTotal(user_id: Long, n_events: Long, total_spend: Double)

  class Processor extends StatefulProcessor[Long, Purchase, SpendTotal] {
    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Purchase],
        timerValues: TimerValues): Iterator[SpendTotal] = {
      var (n, s) = if (totals.exists()) totals.get() else (0L, 0.0)
      // Row order for a key within a micro-batch is not guaranteed stable
      // after groupByKey, and double addition is order-sensitive — so the
      // batch folds into an EXACT BigDecimal (every FINITE double
      // converts exactly; exact addition is order-insensitive), rounded
      // back to double once per batch. Unlike the earlier sort-then-fold
      // this keeps the single-pass O(1)-memory iterator for hot keys
      // with very large per-batch row counts (round-6 advice).
      // Non-finite amounts can't enter a BigDecimal (the constructor
      // throws, which would kill the whole query) — they accumulate in a
      // separate IEEE carrier whose result is order-insensitive too: any
      // NaN poisons to NaN, same-signed infinities keep their sign, and
      // mixed infinities are NaN in every order.
      var exact = java.math.BigDecimal.ZERO
      var rest = 0.0
      var hasRest = false
      if (java.lang.Double.isFinite(s)) exact = new java.math.BigDecimal(s)
      else { rest = s; hasRest = true }
      rows.foreach { p =>
        n += 1
        if (java.lang.Double.isFinite(p.amount))
          exact = exact.add(new java.math.BigDecimal(p.amount))
        else { rest += p.amount; hasRest = true }
      }
      s = if (hasRest) exact.doubleValue() + rest else exact.doubleValue()
      totals.update((n, s))
      Iterator.single(SpendTotal(key, n, s))
    }
  }

  /** One updated (user, n_events, total_spend) row per key per batch. */
  def totals(purchases: Dataset[Purchase]): Dataset[SpendTotal] = {
    import purchases.sparkSession.implicits._
    purchases
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
