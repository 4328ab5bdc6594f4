package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** T24's streaming twin: CONTINUOUS shard packing — the tokenizer feed.
  * Batch q80 assigns each document to a token-budget shard via a keyed
  * prefix sum; the streaming form keeps one running token count per
  * source in ValueState and stamps each arriving document with
  * `shard = cum_before div budget`, so a training-data ingest can pack
  * shards as documents arrive instead of re-running the batch job.
  *
  * Determinism contract: the feed delivers a source's documents in
  * doc_id order ACROSS batches (an appending producer); WITHIN a batch
  * the fold sorts by doc_id, so shuffle arrival order cannot change an
  * assignment. Under that contract PackStreamSpec proves assignments
  * are bit-identical to q80's prefix-sum, for any batch split.
  *
  * Scale shape: O(1) state per source (one long); output carries only
  * (source, doc_id, shard, cum_before). The per-batch sort buffers one
  * key's batch slice — bounded by the micro-batch, not the stream.
  */
object PackStream {

  case class Doc(source: String, doc_id: Long, n_tok: Long)
  case class Packed(source: String, doc_id: Long, shard: Long, cum_before: Long)

  val Budget = 2048L

  class Processor extends StatefulProcessor[String, Doc, Packed] {
    @transient private var cum: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Doc],
        timerValues: TimerValues): Iterator[Packed] = {
      var c = if (cum.exists()) cum.get() else 0L
      val out = rows.toArray.sortBy(_.doc_id).map { d =>
        val before = c
        c += d.n_tok
        Packed(key, d.doc_id, before / Budget, before)
      }
      cum.update(c)
      out.iterator
    }
  }

  /** One (source, doc_id, shard, cum_before) row per document. */
  def pack(docs: Dataset[Doc]): Dataset[Packed] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
