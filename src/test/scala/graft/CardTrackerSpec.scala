package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.streaming.CardTracker
import graft.streaming.CardTracker.Obs

/** The streaming HLL must be the SAME sketch as the oracle-checked
  * batch q115 machinery: after any sequence of micro-batches, each
  * key's (occupied, estimate) equals Relational.hllEstimate over the
  * union of everything fed — bit-for-bit, because registers merge by
  * max and the estimate arithmetic is the identical IEEE expression.
  */
class CardTrackerSpec extends GraftSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("streaming estimates equal the batch HLL over the union of batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    val before = sp.conf.getOption(providerKey)
    sp.conf.set(providerKey, rocksDb)
    val stream = MemoryStream[Obs]
    val query = CardTracker.track(stream.toDS())
      .writeStream.format("memory").queryName("card_out")
      .outputMode("update").start()
    try {
      val b1 = (0 until 300).map(i => Obs("clicks", s"u$i")) ++
        (0 until 40).map(i => Obs("buys", s"b$i"))
      val b2 = (150 until 450).map(i => Obs("clicks", s"u$i")) ++
        (0 until 40).map(i => Obs("buys", s"b$i")) // buys: pure repeats
      stream.addData(b1: _*)
      query.processAllAvailable()
      val afterB1 = sp.sql("SELECT * FROM card_out").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      stream.addData(b2: _*)
      query.processAllAvailable()
      val rows = sp.sql("SELECT * FROM card_out").collect()
      // last emission per key = current state
      val last = rows.zipWithIndex
        .groupBy(_._1.getString(0))
        .map { case (k, rs) => k -> rs.maxBy(_._2)._1 }

      // batch twin over the union, via the oracle-checked Column pipeline
      val union = (b1 ++ b2).toDF("c", "v")
      val batch = Relational.hllEstimate(union).collect()
        .map(r => r.getAs[String]("c") ->
          (r.getAs[Long]("occupied"), r.getAs[Double]("estimate"))).toMap
      assert(batch.keySet == last.keySet)
      batch.foreach { case (k, (occ, est)) =>
        assert(last(k).getLong(1) == occ, s"$k occupied diverges")
        assert(last(k).getDouble(2) == est,
          s"$k estimate diverges: stream ${last(k).getDouble(2)} batch $est")
      }

      // duplication-insensitivity: buys saw only repeats in batch 2, so
      // its estimate must not have moved
      val buysEmissions = rows.filter(_.getString(0) == "buys")
      assert(buysEmissions.length == 2, "buys must emit once per batch")
      assert(afterB1("buys")._2 == last("buys").getDouble(2),
        "repeat-only batch moved the buys estimate")

      // clicks gained 150 new users across batch 2 — estimate must grow
      assert(last("clicks").getDouble(2) > afterB1("clicks")._2)
    } finally {
      query.stop()
      before match {
        case Some(v) => sp.conf.set(providerKey, v)
        case None => sp.conf.unset(providerKey)
      }
    }
  }
}
