package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** T34's streaming twin: canonical-document RETENTION on a stream.
  * Batch q118 picks, per dup cluster, the max-quality member (doc_id as
  * the deterministic tiebreak). Here the same selection runs
  * incrementally: each arriving (cluster_id, doc_id, quality) member may
  * UPGRADE the cluster's current keeper, held as one ValueState tuple,
  * within the event-time watermark horizon — members arriving behind
  * the watermark are ignored, exactly like every other dedup state in
  * this package ages out late re-deliveries.
  *
  * Scale shape: state is one (doc, quality, n) tuple per CLUSTER — the
  * cluster table sizes with the dup rate, not the corpus — sharded by
  * cluster_id across executors on the RocksDB provider. The fold is
  * order-insensitive (strict-improvement argmax with a total order), so
  * within-batch arrival order cannot change the keeper.
  */
object KeeperStream {

  case class Member(cluster_id: Long, doc_id: Long, quality: Double,
      ts: java.sql.Timestamp)
  case class Keeper(cluster_id: Long, kept_doc: Long, kept_quality: Double,
      n_members: Long)

  class Processor extends StatefulProcessor[Long, Member, Keeper] {
    @transient private var best: ValueState[(Long, Double, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      best = getHandle.getValueState[(Long, Double, Long)]("best",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Member],
        timerValues: TimerValues): Iterator[Keeper] = {
      // explicit horizon guard: a member behind the current watermark is
      // late by contract and must not retroactively change the keeper
      // (engine-level late-row filtering also applies in event-time mode;
      // this makes the semantics local and spec-checkable)
      val wm = timerValues.getCurrentWatermarkInMs()
      var state = if (best.exists()) Some(best.get()) else None
      var changed = false
      rows.foreach { m =>
        if (m.ts.getTime >= wm) {
          val better = state match {
            case None => true
            case Some((d, q, _)) =>
              m.quality > q || (m.quality == q && m.doc_id < d)
          }
          val n = state.map(_._3).getOrElse(0L) + 1L
          state = Some(
            if (better) (m.doc_id, m.quality, n)
            else (state.get._1, state.get._2, n))
          changed = true
        }
      }
      if (changed) {
        val (d, q, n) = state.get
        best.update((d, q, n))
        Iterator.single(Keeper(key, d, q, n))
      } else Iterator.empty
    }
  }

  /** One updated keeper row per cluster per micro-batch that touched it. */
  def keepers(members: Dataset[Member]): Dataset[Keeper] = {
    import members.sparkSession.implicits._
    members
      .withWatermark("ts", "1 hour")
      .groupByKey(_.cluster_id)
      .transformWithState(new Processor, TimeMode.EventTime(), OutputMode.Update())
  }
}
