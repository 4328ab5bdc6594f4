package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Bpe

/** T52's serving twin: RAG chunking of an arriving document stream.
  * Because q150 v2 computes the whole chunk grid ROW-LOCALLY (native
  * bpe_word_counts + window_sums — no aggregation anywhere), the
  * streaming form is a plain stateless select over the stream: no
  * watermark, no state, no foreachBatch — the strongest serving shape
  * an operator can have. ChunkStreamSpec proves streamed chunk rows
  * equal batch q150 bit-for-bit across any batch split.
  */
object ChunkStream {

  /** arrivals: (doc_id bigint, text string) → the q150 chunk rows
    * (without the batch query's global orderBy — a stream has no total
    * order; the per-doc grid is complete within the arrival's batch).
    */
  def chunks(arrivals: DataFrame): DataFrame = {
    val C = Bpe.ChunkWords
    val S = Bpe.ChunkStride
    val wc = call_function("bpe_word_counts", col("text"))
    arrivals
      .select(col("doc_id"), size(wc).cast(LongType).as("dl"),
        posexplode(call_function("window_sums", wc, lit(C), lit(S)))
          .as(Seq("cid", "bpe_tokens")))
      .select(col("doc_id"), col("cid").cast(LongType).as("chunk_id"),
        (col("cid").cast(LongType) * S).as("start_word"),
        least(lit(C.toLong), col("dl") - col("cid").cast(LongType) * S).as("n_words"),
        col("bpe_tokens"),
        (col("bpe_tokens") > Bpe.ChunkTokenCap).as("over_cap"))
  }
}
