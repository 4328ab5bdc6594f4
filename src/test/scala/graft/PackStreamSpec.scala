package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.PackStream
import graft.streaming.PackStream.Doc

/** T24 streaming twin: under the in-order feed contract, streamed shard
  * assignments must be bit-identical to q80's batch prefix sum, for any
  * batch split.
  */
class PackStreamSpec extends GraftSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("streamed shard assignments equal the batch prefix-sum") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .orderBy("doc_id")
      .collect().map(r => Doc(r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // the batch truth: q80's per-doc shard (the pre-aggregate projection)
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("shard", expr(s"cum_before div ${PackStream.Budget}"))
      .select("source", "doc_id", "shard").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    val before = sp.conf.getOption(providerKey)
    sp.conf.set(providerKey, rocksDb)
    try {
      val stream = MemoryStream[Doc]
      val query = PackStream.pack(stream.toDS())
        .writeStream.format("memory").queryName("pack_out")
        .outputMode("update").start()
      try {
        // in-order contract: three consecutive doc_id ranges
        val chunks = docs.sortBy(_.doc_id).grouped((docs.size + 2) / 3).toSeq
        chunks.foreach { c => stream.addData(c: _*); query.processAllAvailable() }
        val got = sp.sql("SELECT source, doc_id, shard FROM pack_out")
          .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(got.size == want.size)
        assert(got == want)
      } finally query.stop()
    } finally before match {
      case Some(v) => sp.conf.set(providerKey, v)
      case None => sp.conf.unset(providerKey)
    }
  }

  test("streamed packing billed in REAL tokens equals the batch bpe prefix-sum") {
    // T44's serving story (r15): PackStream is billing-agnostic — feed
    // it bpe_count costs and the streamed assignments must equal the
    // same prefix sum over real tokenizer tokens (q142's pre-aggregate
    // projection, modulo PackStream's own budget constant).
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    val costed = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        coalesce(call_function("bpe_count", col("text")), lit(0L)).as("n_tok"))
    val docs = costed.orderBy("doc_id")
      .collect().map(r => Doc(r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = costed
      .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("shard", expr(s"cum_before div ${PackStream.Budget}"))
      .select("source", "doc_id", "shard").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    val before = sp.conf.getOption(providerKey)
    sp.conf.set(providerKey, rocksDb)
    try {
      val stream = MemoryStream[Doc]
      val query = PackStream.pack(stream.toDS())
        .writeStream.format("memory").queryName("pack_bpe_out")
        .outputMode("update").start()
      try {
        val chunks = docs.sortBy(_.doc_id).grouped((docs.size + 2) / 3).toSeq
        chunks.foreach { c => stream.addData(c: _*); query.processAllAvailable() }
        val got = sp.sql("SELECT source, doc_id, shard FROM pack_bpe_out")
          .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(got.size == want.size)
        assert(got == want)
      } finally query.stop()
    } finally before match {
      case Some(v) => sp.conf.set(providerKey, v)
      case None => sp.conf.unset(providerKey)
    }
  }
}
