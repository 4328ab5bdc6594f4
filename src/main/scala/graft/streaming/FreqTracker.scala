package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** T12 × R55: STREAMING frequency tracker — the portable count-min
  * sketch of `q116_countmin` (Relational.cmsEstimate) kept as per-key
  * MapState, so an unbounded stream answers "how often has each key
  * seen this token" in O(d·w) bounded state per key. Same argument as
  * [[CardTracker]] for HLL: CMS cells merge by ADDITION — each
  * micro-batch folds its occurrences locally and adds once per touched
  * cell, so the streaming cell table after N batches is BIT-IDENTICAL
  * to the batch sketch over the union of those batches, and therefore
  * so is every estimate (FreqTrackerSpec proves it against the
  * oracle-checked batch cmsEstimate).
  *
  * Probe protocol: an observation with n == 0 is a QUERY — it reads the
  * current min-over-d-cells estimate without incrementing, the way a
  * serving layer probes a live sketch. n >= 1 adds n occurrences.
  *
  * State shape: MapState[(i·w + cell) → count] — at most d·w = 1024
  * entries per key, each its own RocksDB entry; a batch rewrites only
  * cells it touches. Contrast an exact per-token map: unbounded state
  * keyed by vocabulary.
  */
object FreqTracker {

  case class Obs(key: String, token: String, n: Long)
  case class Estimate(key: String, token: String, n_est: Long)

  val Depth = 4
  val Width = 256

  /** Same cell as the batch Column form `md5Long(concat_ws(":", i, t))
    * % Width` — md5 of "i:token", low-60-bit prefix, positive modulo.
    */
  def cellOf(i: Int, token: String): Int =
    (CardTracker.md5Long60(s"$i:$token") % Width).toInt

  class Processor extends StatefulProcessor[String, Obs, Estimate] {
    @transient private var cells: MapState[Int, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cells = getHandle.getMapState[Int, Long]("cells",
        Encoders.scalaInt, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[Estimate] = {
      // fold the batch locally: one store write per touched CELL, not
      // per occurrence; cell addition is commutative so within-batch
      // arrival order cannot matter
      val inc = scala.collection.mutable.Map.empty[Int, Long]
      val asked = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { o =>
        asked += o.token
        if (o.n > 0) {
          var i = 0
          while (i < Depth) {
            val fc = i * Width + cellOf(i, o.token)
            inc(fc) = inc.getOrElse(fc, 0L) + o.n
            i += 1
          }
        }
      }
      inc.foreach { case (fc, add) =>
        val cur = if (cells.containsKey(fc)) cells.getValue(fc) else 0L
        cells.updateValue(fc, cur + add)
      }
      // answer every token seen this batch from the FULL current cells
      asked.iterator.map { t =>
        var est = Long.MaxValue
        var i = 0
        while (i < Depth) {
          val fc = i * Width + cellOf(i, t)
          val c = if (cells.containsKey(fc)) cells.getValue(fc) else 0L
          if (c < est) est = c
          i += 1
        }
        Estimate(key, t, est)
      }
    }
  }

  /** One (key, token, n_est) row per distinct token per batch. */
  def track(obs: Dataset[Obs]): Dataset[Estimate] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.key)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
