package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** T16's streaming twin: benchmark-leakage DECONTAMINATION on a
  * document stream. The batch sweep (q56) joins training shingles
  * against the eval set once; a production ingest wants the same
  * verdict as documents ARRIVE, against a static benchmark table. This
  * is the canonical stream-static shape: the arriving doc explodes to
  * its distinct hashed 5-gram ids map-side (array_distinct before the
  * explode — per-doc dedup without state), joins the broadcast eval
  * table, and a watermark-bounded windowed aggregate counts shared
  * shingles per (doc, eval_id).
  *
  * Scale shape: the stream side never shuffles document text — only
  * (ts, doc_id, 8-byte shingle id) survivors of the broadcast semi
  * join; aggregate state is keyed by (window, doc, eval_id) and holds
  * MATCHED pairs only, evicted by the watermark. Re-delivery contract:
  * upstream dedup (DocStream.curate) delivers each doc once; a
  * re-delivered doc would re-count.
  */
object ContamStream {

  /** `docs`: streaming (ts: timestamp, doc_id: long, text: string);
    * `evalShingles`: static (eval_id, shingle) — e.g.
    * [[Dedup.evalShingles]]. Emits (doc_id, eval_id, n_shared) for
    * pairs at or above [[Dedup.MinContamShingles]].
    */
  def hits(docs: DataFrame, evalShingles: DataFrame): DataFrame =
    docs
      .withWatermark("ts", "1 hour")
      .withColumn("toks", split(col("text"), " "))
      .select(col("ts"), col("doc_id"),
        explode(array_distinct(
          TextFunctions.hashedShinglesFromTokens(col("toks"), 5))).as("shingle"))
      .join(broadcast(evalShingles), Seq("shingle"))
      .groupBy(window(col("ts"), "1 hour"), col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= Dedup.MinContamShingles)
      .select(col("doc_id"), col("eval_id"), col("n_shared"))
}
