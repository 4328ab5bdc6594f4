package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.ContamStream

/** T16 streaming twin: contamination verdicts on arriving docs must
  * equal the batch q56 sweep over the same training slice.
  */
class ContamStreamSpec extends GraftSpec {

  case class Doc(ts: Timestamp, doc_id: Long, text: String)

  test("streamed contamination hits equal the batch q56 sweep") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    val t0 = Timestamp.valueOf("2024-06-01 12:00:00")
    val train = Tables.documents(spark, sfDir)
      .filter(col("source") =!= "src0")
      .select("doc_id", "text").collect()
      .map(r => Doc(t0, r.getLong(0), r.getString(1))).toSeq
    val evalSh = Dedup.evalShingles(spark, sfDir)

    val stream = MemoryStream[Doc]
    val query = ContamStream.hits(stream.toDF(), evalSh)
      .writeStream.format("memory").queryName("contam_out")
      .outputMode("update").start()
    try {
      // two micro-batches; counts must accumulate correctly per doc
      val (b1, b2) = train.partition(_.doc_id % 2 == 0)
      stream.addData(b1: _*)
      query.processAllAvailable()
      stream.addData(b2: _*)
      query.processAllAvailable()
      val got = sp.sql(
        """SELECT doc_id, eval_id, MAX(n_shared) FROM contam_out
          |GROUP BY doc_id, eval_id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = Dedup.q56Decontaminate(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"stream=${got.size} batch=${want.size}")
      assert(want.nonEmpty)
    } finally query.stop()
  }
}
