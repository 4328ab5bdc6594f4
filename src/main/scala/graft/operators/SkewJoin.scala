package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §5).
  *
  * AQE's skew-join splitting handles most cases at runtime; this is the
  * explicit form for when a handful of keys dominate so heavily that even
  * split sub-partitions overwhelm one executor (classic 100 TB hot-key
  * problem: one CIK with millions of filings, one document template
  * shared by half the corpus).
  *
  * Mechanics: the skewed (big) side gets a random-ish but DETERMINISTIC
  * salt in [0, n) derived from a row-unique column; the small side is
  * replicated n ways via explode. The join key becomes (key, salt) —
  * fan-out n on the small side, perfect spread on the big side.
  */
object SkewJoin {

  /** Inner-join `big` with `small` on `key`, salting `big` by hashing
    * `saltSource` (any row-distinguishing column) into n buckets.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, buckets: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
