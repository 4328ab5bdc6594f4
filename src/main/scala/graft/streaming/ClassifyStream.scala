package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Classify, LrTrain}
import graft.functions.TextFunctions.md5Long

/** Streaming LR scoring (SURVEY.md §2.3 T12 × E12): the registry's
  * trained documents model applied to a document STREAM — the serving
  * half of q129's train-once architecture (the reference scores each
  * incoming batch with its shipped joblib artifact at
  * run_build_database.py:301-327; here the artifact is the same
  * collected weight matrix q28 scores with).
  *
  * Scale shape: the model rides as ONE map literal (bucket → packed
  * per-class micro weights, ≤ NumBuckets entries — KBs), so scoring is
  * a stateless row-local projection: no shuffle, no streaming state, no
  * watermark — the shape that keeps a 100 TB/day scoring stream
  * embarrassingly parallel. Per-doc margins are exact long folds over
  * the token array, bit-identical to q28's batch sums for any document
  * whose tokens the training corpus saw (spec-proven). One deliberate
  * divergence: a document with NO trained token is dropped by q28's
  * inner scoring join, but a stream must verdict every arriving row, so
  * it gets the zero-margin verdict (class 0, score 0.0) here.
  */
object ClassifyStream {

  /** The per-row margin fold over the broadcast map literal — shared
    * by the argmax scorer and the proba scorer.
    */
  private def marginCol(s: SparkSession, dir: String) = {
    val wide = LrTrain.docWeightsWide(s, dir)
    // resolve field positions by NAME: positional indexing was only
    // valid for the empty-modelKey doc matrix and would silently build
    // a wrong map for any keyed wide frame (r10 ADVICE)
    val bIdx = wide.schema.fieldIndex("bucket")
    val wIdx = (0 until Classify.NumClasses).map(c => wide.schema.fieldIndex(s"w$c"))
    val wmap: Map[Long, Seq[Long]] = wide.collect().map { r =>
      r.getLong(bIdx) -> wIdx.map(r.getLong)
    }.toMap
    // a single MapType literal — constant-folded, no per-entry codegen
    val wlit = typedLit(wmap)
    val zero = array(Seq.fill(Classify.NumClasses)(lit(0L)): _*)
    aggregate(
      filter(split(col("text"), " "), t => length(t) > 0),
      zero,
      (acc, t) => zip_with(acc,
        coalesce(
          element_at(wlit, pmod(md5Long(t), lit(Classify.NumBuckets))),
          zero),
        (a, b) => a + b))
  }

  private def bestOfMargins: org.apache.spark.sql.Column =
    greatest((0 until Classify.NumClasses).map(c =>
      struct(element_at(col("margins"), c + 1).as("m"), lit(-c).as("negc"))): _*)

  /** `docs` must carry (ts: timestamp, doc_id: long, text: string);
    * works identically on a static frame (the spec's equality proof).
    */
  def score(s: SparkSession, dir: String, docs: DataFrame): DataFrame =
    docs
      .withColumn("margins", marginCol(s, dir))
      .withColumn("b", bestOfMargins)
      .select(col("ts"), col("doc_id"),
        (-col("b.negc")).cast("int").as("pred_class"),
        (col("b.m").cast("double") / 1000000.0).as("best_score"))

  /** Streaming predict_proba — q134's calibrated per-class
    * probabilities on a document stream, same stateless row-local
    * shape as score(): the sigmoid quantization and truncating
    * normalization are q134's exact integer pipeline, so every emitted
    * row is bit-identical to the batch output for any doc the batch
    * scorer covers (spec-proven); a doc with NO trained token gets the
    * uniform zero-margin distribution (σ(0)·1e6 = 500000 per head,
    * prob 200000 each) instead of being dropped — the stream-verdicts-
    * every-row rule score() already documents.
    */
  def scoreProba(s: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    // the ARRAY form of MlEval.sigmoidMicros/probMicros (the lambda
    // maps the shared scalar pipeline over the margin array) — the
    // bit-equality spec pins this against batch q134 exactly
    val sg = transform(col("margins"),
      m => graft.operators.MlEval.sigmoidMicros(m))
    docs
      .withColumn("margins", marginCol(s, dir))
      .withColumn("b", bestOfMargins)
      .withColumn("sg", sg)
      .withColumn("stot", aggregate(col("sg"), lit(0L), (a, x) => a + x))
      .select(col("ts"), col("doc_id"), col("stot"),
        (-col("b.negc")).cast("int").as("pred_class"),
        posexplode(col("sg")).as(Seq("pos", "sgm_micros")))
      .select(col("ts"), col("doc_id"), col("pos").cast("int").as("cls"),
        col("sgm_micros"),
        graft.operators.MlEval.probMicros(col("sgm_micros"), col("stot"))
          .as("prob_micros"),
        col("pred_class"))
  }
}
