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
