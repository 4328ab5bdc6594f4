package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.streaming.FreqTracker
import graft.streaming.FreqTracker.Obs

/** T12 × R55: the streaming CMS must be bit-identical to the
  * oracle-checked batch sketch over the union of its batches —
  * mergeability-by-addition made operational — and a zero-increment
  * probe must read without writing.
  */
class FreqTrackerSpec extends GraftSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("streaming estimates after any batch split equal the batch CMS") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    // the real corpus' token counts, and the batch sketch's top-10 probes
    val d = Tables.documents(spark, sfDir)
    val tokCounts = d.select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = Relational.q116CountMin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap // token -> n_est

    val before = sp.conf.getOption(providerKey)
    sp.conf.set(providerKey, rocksDb)
    try {
      val stream = MemoryStream[Obs]
      val query = FreqTracker.track(stream.toDS())
        .writeStream.format("memory").queryName("freq_out")
        .outputMode("update").start()
      try {
        // two arbitrary batches (split by token hash parity), then a
        // zero-increment probe batch for the batch sketch's query keys
        val (b1, b2) = tokCounts.partition(_._1.hashCode % 2 == 0)
        stream.addData(b1.map { case (t, n) => Obs("docs", t, n) }: _*)
        query.processAllAvailable()
        stream.addData(b2.map { case (t, n) => Obs("docs", t, n) }: _*)
        query.processAllAvailable()
        stream.addData(batch.keys.toSeq.map(t => Obs("docs", t, 0L)): _*)
        query.processAllAvailable()
        // the LAST emission per token is the probe answer (batch id via
        // n_est monotonicity is not valid here — counts only grow, so
        // take the max estimate per token, which is the final one)
        val got = sp.sql(
          """SELECT token, MAX(n_est) FROM freq_out GROUP BY token""")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        batch.foreach { case (t, est) =>
          assert(got(t) == est, s"token $t: stream ${got(t)} vs batch $est")
        }
        // probing again must not have changed any cell: re-probe matches
        stream.addData(batch.keys.toSeq.map(t => Obs("docs", t, 0L)): _*)
        query.processAllAvailable()
        val again = sp.sql(
          """SELECT token, MAX(n_est) FROM freq_out GROUP BY token""")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        batch.keys.foreach(t => assert(again(t) == got(t), s"probe wrote: $t"))
      } finally query.stop()
    } finally before match {
      case Some(v) => sp.conf.set(providerKey, v)
      case None => sp.conf.unset(providerKey)
    }
  }
}
