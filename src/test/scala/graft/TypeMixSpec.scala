package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.TypeMix
import graft.streaming.TypeMix.Event

/** T12 MapState surface: per-user event-type histogram on a
  * MemoryStream — cross-batch carry of individual map entries, and
  * batches touching only their own entries. RocksDB provider set
  * per-test and restored, like SpendTrackerSpec.
  */
class TypeMixSpec extends GraftSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("MapState histogram carries per-type counts across micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    val before = sp.conf.getOption(providerKey)
    sp.conf.set(providerKey, rocksDb)
    val stream = MemoryStream[Event]
    val query = TypeMix.mix(stream.toDS())
      .writeStream.format("memory").queryName("typemix_out")
      .outputMode("update").start()
    try {
      stream.addData(Event(1, "click"), Event(1, "click"), Event(1, "buy"),
        Event(2, "view"))
      query.processAllAvailable()
      val b1 = sp.sql("SELECT * FROM typemix_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(b1 == Set((1L, "click", 2L), (1L, "buy", 1L), (2L, "view", 1L)), b1)

      // second batch: only touched entries are emitted, and each carries
      // its own running total — "click" continues from 2, "view" for
      // user 1 starts fresh, user 2's untouched map is silent
      stream.addData(Event(1, "click"), Event(1, "view"))
      query.processAllAvailable()
      val all = sp.sql("SELECT * FROM typemix_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(all.contains((1L, "click", 3L)), all)
      assert(all.contains((1L, "view", 1L)), all)
      assert(!all.contains((2L, "view", 2L)), all)

      // the final state equals the batch-mode histogram of everything fed
      val expected = Map((1L, "click") -> 3L, (1L, "buy") -> 1L,
        (1L, "view") -> 1L, (2L, "view") -> 1L)
      val finalCounts = all.groupBy(t => (t._1, t._2))
        .map { case (k, ts) => k -> ts.map(_._3).max }
      assert(finalCounts == expected, finalCounts)
    } finally {
      query.stop()
      before match {
        case Some(v) => sp.conf.set(providerKey, v)
        case None => sp.conf.unset(providerKey)
      }
    }
  }
}
