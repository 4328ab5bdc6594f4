package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** T12 × R54: STREAMING distinct-cardinality tracker — the portable
  * HyperLogLog of `q115_portable_hll` (Relational.hllEstimate) kept as
  * per-key MapState, so an unbounded stream answers "how many distinct
  * values has each key seen so far" in O(64) state per key. This is the
  * sketch mergeability argument made operational: each micro-batch
  * folds into max-per-bucket registers, exactly the combine the batch
  * groupBy performs, so the streaming estimate after N batches is
  * BIT-IDENTICAL to the batch estimate over the union of those batches
  * (CardTrackerSpec proves it against the oracle-checked hllEstimate).
  *
  * State shape: MapState[bucket → M] — at most 64 entries per key,
  * each its own RocksDB entry; a batch rewrites only buckets it
  * actually raises (registers only ever increase, the monotonicity
  * that makes HLL merge-safe). Contrast a per-key HashSet: unbounded
  * state, and a 10^9-distinct key would rewrite megabytes per batch.
  */
object CardTracker {

  case class Obs(key: String, v: String)
  case class Estimate(key: String, occupied: Long, estimate: Double)

  private val M = 64

  /** JVM twin of TextFunctions.md5Long — md5 is the cross-engine hash,
    * so the same value lands in the same bucket with the same rank in
    * the stream, the batch Column pipeline, and the DuckDB oracle.
    */
  def md5Long60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** rho of the low 54 bits, matching 55 - length(bin(w)) with w>0. */
  def rho(w: Long): Int =
    if (w == 0L) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))

  /** The q115 estimate over (occupied, s_occ) register aggregates —
    * the same IEEE expression tree the Column/SQL twins fold.
    */
  def estimateOf(occupied: Long, sOcc: Long): Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / 64.0)
    val sTotal = sOcc + (M - occupied) * (1L << 55)
    val zeros = M - occupied
    val eRaw = alpha * 4096.0 * math.pow(2, 55) / sTotal.toDouble
    val e =
      if (eRaw <= 160.0 && zeros > 0) 64.0 * math.log(64.0 / zeros.toDouble)
      else eRaw
    BigDecimal.valueOf(e).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .doubleValue
  }

  class Processor extends StatefulProcessor[String, Obs, Estimate] {
    @transient private var regs: MapState[Long, Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      regs = getHandle.getMapState[Long, Int]("regs",
        Encoders.scalaLong, Encoders.scalaInt, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[Estimate] = {
      // fold the batch locally (one store write per RAISED bucket, not
      // per observation), then merge monotonically into MapState
      val batch = scala.collection.mutable.Map.empty[Long, Int]
      rows.foreach { o =>
        val h = md5Long60(o.v)
        val bucket = h >>> 54
        val r = rho(h & ((1L << 54) - 1))
        if (r > batch.getOrElse(bucket, Int.MinValue)) batch(bucket) = r
      }
      batch.foreach { case (b, r) =>
        if (!regs.containsKey(b) || regs.getValue(b) < r) regs.updateValue(b, r)
      }
      // estimate from the FULL current register set
      var occupied = 0L
      var sOcc = 0L
      regs.iterator().foreach { case (_, m) =>
        occupied += 1
        sOcc += 1L << (55 - m)
      }
      Iterator.single(Estimate(key, occupied, estimateOf(occupied, sOcc)))
    }
  }

  /** One (key, occupied, estimate) row per touched key per batch. */
  def track(obs: Dataset[Obs]): Dataset[Estimate] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.key)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
