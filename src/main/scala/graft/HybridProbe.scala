package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Quantize, Retrieval}
import graft.streaming.HybridServe

/** Hybrid-serve rung probe (r15 verdict next-round #3): separates the
  * one-time PUBLISH cost of the two retriever artifacts from the
  * per-request-batch HYBRID serve cost (BM25 over the tb-partitioned
  * postings + IVFADC over the cell-partitioned codes + rank-space RRF),
  * measured beside each retriever's solo serve so the fusion overhead
  * is visible. Requests are the T6 convention probes (ids 0..9) with
  * both text and embedding.
  *
  * Usage: runMain graft.HybridProbe <sfDir> [reps]
  */
object HybridProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      math.rint((System.nanoTime() - t0) / 1e6) / 1000
    }
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    val lexDir = Files.createTempDirectory("hyb_lex").toFile.getAbsolutePath
    val semDir = Files.createTempDirectory("hyb_sem").toFile.getAbsolutePath
    val pubLex = secs(Retrieval.publishBm25(Retrieval.buildBm25Index(spark, dir), lexDir))
    val pubSem = secs(Quantize.publishIndex(Quantize.buildIndex(spark, dir), semDir))
    val lex = Retrieval.loadBm25(spark, lexDir)
    val sem = Quantize.loadIndex(spark, semDir)

    val requests = Tables.documents(spark, dir)
      .filter(col("doc_id") < Retrieval.NumQueries)
      .select(col("doc_id").as("query_id"), col("text"))
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id").as("query_id"), col("embedding").as("pvec")),
        Seq("query_id"))
      .cache()
    require(requests.count() == Retrieval.NumQueries)

    val lexServe = (1 to reps).map(_ => secs(require(
      Retrieval.scoreQueries(requests.select("query_id", "text"), lex,
        excludeSelf = true).count() > 0)))
    val semServe = (1 to reps).map(_ => secs(require(
      Quantize.probeTopK(
        requests.select(col("query_id").as("probe_id"), col("pvec")), sem)
        .count() > 0)))
    val hybServe = (1 to reps).map(_ => secs(require(
      HybridServe.fused(requests, lex, sem, excludeSelf = true).count() > 0)))

    println("=====HYBRIDPROBE=====")
    println(s"""{"dir":"$dir","reps":$reps,""" +
      s""""publish_bm25_s":${f(pubLex)},"publish_pq_s":${f(pubSem)},""" +
      s""""bm25_serve_s":[${lexServe.map(f).mkString(",")}],""" +
      s""""pq_serve_s":[${semServe.map(f).mkString(",")}],""" +
      s""""hybrid_serve_s":[${hybServe.map(f).mkString(",")}]}""")
    spark.stop()
  }
}
