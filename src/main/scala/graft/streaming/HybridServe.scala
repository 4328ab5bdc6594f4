package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Quantize, Retrieval}

/** T51's serving capstone (r15 verdict next-round #3): hybrid search
  * answered per request from the TWO published indexes — each arriving
  * (query_id, text, pvec) request is BM25-scored against the published
  * inverted index (Retrieval.loadBm25), ANN-scored against the
  * published IVFADC index (Quantize.loadIndex), and the two rank lists
  * fuse through the same retriever-agnostic `fuseRrf` that q149's
  * oracle-checked batch fusion runs. q149 fuses two self-contained
  * batch queries; this is the production shape — fit once, publish
  * both artifacts, fuse in rank space per micro-batch, no score
  * calibration across retrievers (Cormack et al., SIGIR 2009).
  *
  * Stateless per-request computation like Bm25Serve/PqServe: no
  * watermark, no state; each micro-batch's fused top-k lands in the
  * sink within its own batch. HybridServeSpec proves streamed fused
  * rows equal the batch composition bit-for-bit across a batch split.
  *
  * Scale shape per batch: the BM25 side reads ≤ |vocab| of the
  * TermBuckets posting partitions (tb partition pruning + in-file term
  * sort); the ANN side reads nprobe cells of the cell-partitioned
  * codes; both broadcast only request-sized state. The fusion's
  * full-outer join runs over two ≤ requests·TopK rank lists — floor
  * cost at any corpus size.
  */
object HybridServe {

  /** The batch composition (also the spec's ground truth): fused top-k
    * for a static (query_id, text, pvec) request frame. `excludeSelf`
    * applies to BOTH retrievers symmetrically — false for production
    * request ids, true when requests are corpus docs (the parity
    * convention).
    */
  def fused(requests: DataFrame, lex: Retrieval.Bm25Index,
      sem: Quantize.PqIndex, excludeSelf: Boolean = false): DataFrame =
    Retrieval.fuseRrf(
      Retrieval.scoreQueries(requests.select("query_id", "text"), lex, excludeSelf)
        .select(col("query_id"), col("doc_id").as("cand_id"),
          col("rk").as("rk_lex")),
      Quantize.probeTopK(
        requests.select(col("query_id").as("probe_id"), col("pvec")),
        sem, excludeSelf)
        .select(col("probe_id").as("query_id"), col("vec_id").as("cand_id"),
          col("rk").as("rk_sem")))

  def serve(arrivals: DataFrame, lex: Retrieval.Bm25Index,
      sem: Quantize.PqIndex, sinkDir: String,
      excludeSelf: Boolean = false): StreamingQuery =
    arrivals.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        fused(batch, lex, sem, excludeSelf)
          .write.mode("append").parquet(sinkDir)
      }
      .start()

  /** Version-consistent fusion (r16 verdict #1): both retrievers come
    * from ONE [[graft.operators.IndexSet.HybridSnapshot]] — a single
    * manifest resolution — so the fused ranking can never straddle two
    * corpus versions. Because a snapshot's segments are immutable, the
    * pinned version keeps serving bit-identically even while appends,
    * deletes, or compactions commit beside it (IndexSetSpec).
    */
  def fusedFromSnapshot(requests: DataFrame,
      snap: graft.operators.IndexSet.HybridSnapshot,
      excludeSelf: Boolean = false): DataFrame =
    fused(requests, snap.bm25, snap.pq, excludeSelf)
      .withColumn("corpus_version", lit(snap.manifest.corpusVersion))

  /** Streamed form: the snapshot is resolved ONCE by the caller, before
    * the stream starts — every micro-batch serves the same pinned
    * corpus version (stamped on each output row), by construction.
    */
  def serveSnapshot(arrivals: DataFrame,
      snap: graft.operators.IndexSet.HybridSnapshot, sinkDir: String,
      excludeSelf: Boolean = false): StreamingQuery =
    arrivals.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        fusedFromSnapshot(batch, snap, excludeSelf)
          .write.mode("append").parquet(sinkDir)
      }
      .start()

  /** Retrieve→FETCH composed (r16 verdict #3): the production RAG shape
    * returns fused top-k WITH the documents' content in the same
    * micro-batch, not ids for a second round-trip. The fused ranking is
    * request-sized (≤ requests · TopK rows), so it re-enters as a
    * LocalRelation (exact stats — the r15 estimate-laundering fix) and
    * the content read prunes to the ids' db partition dirs through
    * IndexSet.fetchDocs: ≤ k directories opened per batch at any corpus
    * size. `text` is null for a ranked candidate absent from the doc
    * store (a vector-only corpus member).
    */
  def fusedWithContent(requests: DataFrame,
      snap: graft.operators.IndexSet.HybridSnapshot,
      excludeSelf: Boolean = false): DataFrame = {
    val s = snap.docs.sparkSession
    val ranked = fusedFromSnapshot(requests, snap, excludeSelf)
    val topk = ranked.collect() // bounded: requests × TopK
    val local = s.createDataFrame(
      java.util.Arrays.asList(topk: _*), ranked.schema)
    val ids = topk.map(_.getLong(ranked.schema.fieldIndex("cand_id"))).distinct.toSeq
    local.join(
      graft.operators.IndexSet.fetchDocs(snap, ids)
        .withColumnRenamed("doc_id", "cand_id"),
      Seq("cand_id"), "left")
      .select("query_id", "rk", "cand_id", "rrf_u", "rk_lex", "rk_sem",
        "corpus_version", "text")
  }

  /** Streamed retrieve→fetch: each arriving request's fused top-k lands
    * in the sink WITH content, within its own micro-batch, from the one
    * pinned snapshot.
    */
  def serveSnapshotWithContent(arrivals: DataFrame,
      snap: graft.operators.IndexSet.HybridSnapshot, sinkDir: String,
      excludeSelf: Boolean = false): StreamingQuery =
    arrivals.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        fusedWithContent(batch, snap, excludeSelf)
          .write.mode("append").parquet(sinkDir)
      }
      .start()
}
