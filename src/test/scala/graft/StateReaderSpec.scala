package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** S15: Spark 4 state-store READER — streaming state checkpoints exposed
  * as a batch DataFrame (`spark.read.format("statestore")`), the ops
  * surface for inspecting a production job's keyed state offline (skew
  * hunts, corruption triage, state-size audits) without touching the
  * running query. The spec runs a keyed streaming aggregation against a
  * checkpoint across two micro-batches, then reads the final state
  * offline and checks it equals both the expected counts and the
  * query's own complete-mode output.
  */
class StateReaderSpec extends GraftSpec {

  test("statestore source reads a streaming aggregation's keyed state") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-state").toString
    val stream = MemoryStream[(Long, Double)]
    val agg = stream.toDF().toDF("user_id", "value")
      .groupBy("user_id").count()
    val q = agg.writeStream.format("memory").queryName("state_out")
      .option("checkpointLocation", dir).outputMode("complete").start()
    try {
      stream.addData(Seq((1L, 1.0), (1L, 2.0), (2L, 3.0)))
      q.processAllAvailable()
      // second batch: state must reflect the cross-batch accumulation
      stream.addData(Seq((2L, 4.0), (3L, 5.0)))
      q.processAllAvailable()
    } finally q.stop()

    val state = sp.read.format("statestore").load(dir)
      .selectExpr("key.user_id", "value.count")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state == Map(1L -> 2L, 2L -> 2L, 3L -> 1L), state.toString)

    // the offline state view and the live query's output agree
    val out = sp.sql("SELECT user_id, count FROM state_out")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state == out, s"state $state != output $out")
  }
}
