package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.Relational.{dmoney, out2}

/** Structured Streaming surface (SURVEY.md §2.3 T12).
  *
  * The same windowed aggregation runs in three modes:
  *  - [[windowedCounts]] on any streaming DataFrame (MemoryStream in
  *    tests, Kafka/files in production) with a watermark — incremental
  *    state, late data dropped past 2 hours;
  *  - [[q52WindowAgg]] as the batch twin over the events table — the
  *    oracle-checkable form (a streaming query's total output over a
  *    finite input equals the batch aggregation);
  *  - at 100 TB/day the state store is keyed by (window, event_type) —
  *    bounded cardinality — and the watermark caps state size.
  */
object EventStream {

  /** Streaming: tumbling 1-hour windows per event type with a 2-hour
    * watermark. `events` must have (ts: timestamp, event_type, value).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        out2(sum(dmoney(col("value")))).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Stream-stream interval join: each purchase attributed to a signup of
    * the same user within the preceding `window`. Both sides carry
    * watermarks so Spark can discard buffered state once the event-time
    * bound passes — state stays O(active interval), not O(stream).
    * At 100 TB/day this is the canonical attribution join: shuffle is
    * hash(user_id), per-key state bounded by the interval.
    */
  def purchaseAttribution(signups: DataFrame, purchases: DataFrame): DataFrame = {
    val s = signups
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
      .withWatermark("signup_ts", "1 hour")
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "1 hour")
    p.join(s,
      col("p_user") === col("s_user") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr("INTERVAL 24 HOURS"))
      .select(col("p_user").as("user_id"), col("signup_ts"), col("purchase_ts"), col("value"))
  }

  /** Streaming exact dedup — the streaming twin of T1 (q40): drop
    * re-deliveries of the same event_id arriving within the watermark
    * delay. dropDuplicatesWithinWatermark keeps per-key state only until
    * the watermark passes, so state is O(keys per 2h), not O(stream) —
    * the property that makes at-least-once ingestion dedup viable at
    * 100 TB/day.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: each streaming event picks up its
    * user's dimension row. The static side is broadcast (stateless,
    * re-resolved per micro-batch — dimension updates between batches are
    * picked up automatically), so the stream never shuffles: this is the
    * standard dimension-enrichment shape at 100 TB/day. Left join keeps
    * events whose key has no dimension row (enrichment must not drop
    * facts).
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left_outer")

  /** Streaming upsert sink — the streaming twin of q61's merge/upsert:
    * each micro-batch of (key, value, is_delete) changes folds into a
    * keyed snapshot directory via foreachBatch. Per batch: read the
    * generation named by the LATEST pointer file, full-outer merge on
    * the key (latest change per key wins — ties broken by a monotonic
    * batch sequence), write the other generation, then flip the
    * pointer. The pointer (not the batch id) names the live generation,
    * so a restarted query — whose batch ids reset — continues from the
    * newest committed state; read failures propagate instead of being
    * mistaken for an empty snapshot. At scale both sides co-partition
    * on the key — the same one-shuffle shape as q61.
    */
  def upsertSink(changes: DataFrame, snapDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(snapDir)
          .getFileSystem(sp.sparkContext.hadoopConfiguration)
        val pointer = new org.apache.hadoop.fs.Path(snapDir, "LATEST")
        val current: Option[String] =
          if (fs.exists(pointer)) {
            val in = new java.io.BufferedReader(
              new java.io.InputStreamReader(fs.open(pointer), "UTF-8"))
            try Option(in.readLine()).map(_.trim).filter(_.nonEmpty)
            finally in.close()
          } else None
        val nextGen =
          if (current.exists(_.endsWith("gen0"))) s"$snapDir/gen1" else s"$snapDir/gen0"
        // latest change per key within the batch wins
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy(col("seq").desc)
        val latest = batch
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("key"), col("value").as("new_value"), col("is_delete"))
        val base = current.map(sp.read.parquet(_)).getOrElse(
          sp.createDataFrame(sp.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField("key", LongType), StructField("value", DoubleType)))))
        base.join(latest, Seq("key"), "full_outer")
          .filter(!coalesce(col("is_delete"), lit(false)))
          .select(col("key"), coalesce(col("new_value"), col("value")).as("value"))
          .write.mode("overwrite").parquet(nextGen)
        val out = fs.create(pointer, true)
        try out.write(nextGen.getBytes("UTF-8")) finally out.close()
        ()
      }
      .start()
  }

  // T12 batch twin: identical semantics via date_trunc — oracle-checked.
  def q52WindowAgg(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        out2(sum(dmoney(col("value")))).as("total_value"))
      .orderBy("window_start", "event_type")
  }

  val q52Sql: String =
    """SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
      | COUNT(*) AS n_events,
      | CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin
}
