package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed [[Aggregator]] (SURVEY.md §2.1 R28) — the
  * extension point complementing the custom Catalyst Expression
  * (RollingHash): a MERGEABLE aggregate whose state never exceeds k
  * entries. At 100 TB this beats sort-based top-k by construction: each
  * partition reduces to ≤ k items map-side and the shuffle carries only
  * those, instead of range-sorting the whole column.
  *
  * Ties on value break on the (unique) id so partial-merge order can
  * never change the result.
  */
object TopKAgg {

  val K = 3

  private def ord: Ordering[(Double, Long)] =
    Ordering.by { case (v, id) => (-v, id) }

  /** Bounded top-k of scored candidates for the SERVE ranking paths
    * (r16): input (score_u, cand_id, payload) longs, ordered
    * (score_u DESC, cand_id ASC) — exactly the retrieval tie-break.
    * Replaces the per-query row_number window in
    * Retrieval.scoreQueries: the window shape repartitions EVERY
    * scored (query, doc) pair to one task per query and sorts millions
    * of rows there (measured at the 5M-doc rung: the ranking stage,
    * not the pruned scan, dominated the serve floor); this aggregate
    * reduces each partition to ≤ k rows map-side, so the final
    * per-query shuffle carries ≤ k·partitions rows total. Ties break
    * on the unique cand_id, so partial-merge order can never change
    * the result (the Top3 discipline) — the serve-equals-batch parity
    * spec pins bit-equality against the window form.
    */
  final class ScoredTopK(k: Int)
      extends Aggregator[(Long, Long, Long), Seq[(Long, Long, Long)],
        Seq[(Long, Long, Long)]] {
    private def ordK: Ordering[(Long, Long, Long)] =
      Ordering.by { case (s, id, _) => (-s, id) }
    override def zero: Seq[(Long, Long, Long)] = Nil
    override def reduce(b: Seq[(Long, Long, Long)],
        a: (Long, Long, Long)): Seq[(Long, Long, Long)] =
      if (b.size >= k && ordK.gteq(a, b.last)) b
      else ((a +: b).sorted(ordK)).take(k)
    override def merge(b1: Seq[(Long, Long, Long)],
        b2: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
      (b1 ++ b2).sorted(ordK).take(k)
    override def finish(r: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Long, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()
  }

  /** input (value, id) → state: ≤ K best pairs, kept sorted. */
  object Top3 extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Double]] {
    override def zero: Seq[(Double, Long)] = Nil
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      // buffers are always kept sorted, so a full buffer rejects a
      // non-improving row in O(1) — the overwhelmingly common case on a
      // hot path; only genuine top-k candidates pay the re-sort
      if (b.size >= K && ord.gteq(a, b.last)) b
      else ((a +: b).sorted(ord)).take(K)
    override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
      (b1 ++ b2).sorted(ord).take(K)
    override def finish(r: Seq[(Double, Long)]): Seq[Double] = r.map(_._1)
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
