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

  /** `docs` must carry (ts: timestamp, doc_id: long, text: string);
    * works identically on a static frame (the spec's equality proof).
    */
  def score(s: SparkSession, dir: String, docs: DataFrame): DataFrame = {
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
    val margins = aggregate(
      filter(split(col("text"), " "), t => length(t) > 0),
      zero,
      (acc, t) => zip_with(acc,
        coalesce(
          element_at(wlit, pmod(md5Long(t), lit(Classify.NumBuckets))),
          zero),
        (a, b) => a + b))
    val best = greatest((0 until Classify.NumClasses).map(c =>
      struct(element_at(col("margins"), c + 1).as("m"), lit(-c).as("negc"))): _*)
    docs
      .withColumn("margins", margins)
      .withColumn("b", best)
      .select(col("ts"), col("doc_id"),
        (-col("b.negc")).cast("int").as("pred_class"),
        (col("b.m").cast("double") / 1000000.0).as("best_score"))
  }
}
