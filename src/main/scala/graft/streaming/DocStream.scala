package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Streaming document curation (SURVEY.md §2.3 T12 × T1/T8): the
  * stateless slice of the q58 batch pipeline applied to a document
  * STREAM — exact dedup within the watermark horizon plus the q48
  * quality gate, producing a keep/drop verdict per arriving document.
  *
  * Scale shape: the dedup state is keyed by content hash and bounded by
  * the watermark (late re-deliveries beyond 1 hour age out of the state
  * store); the quality score is a pure projection — no state at all. At
  * 100 TB/day this is the front door of the corpus: dedup + gate before
  * anything expensive (near-dup, decontamination) runs downstream in
  * batch.
  */
object DocStream {

  /** `docs` must carry (ts: timestamp, doc_id: long, text: string). */
  def curate(docs: DataFrame, minQuality: Double = 0.4): DataFrame =
    docs
      .withWatermark("ts", "1 hour")
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicatesWithinWatermark("content_hash")
      .withColumn("quality", TextOps.qualityExpr(col("text")))
      // qualityExpr is total over empty text (nChar==0 is defined, not a
      // 0/0 division); the null-keep branch covers NULL text and any
      // future unscorable input — an unscorable doc is KEPT, never a NULL
      // verdict that filter(keep) and filter(!keep) would both drop
      .withColumn("keep", col("quality").isNull || col("quality") >= minQuality)
      .select("ts", "doc_id", "content_hash", "quality", "keep")
}
