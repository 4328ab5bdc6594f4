package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Disposable serve-path cost breakdown for the published BM25 index:
  * publishes once, then times (a) the pruned postings scan alone,
  * (b) scan + qterms join, (c) the full scoreQueries, so a serve
  * regression can be attributed to I/O, join, or the ranking shuffle.
  *
  * Usage: runMain graft.RetrDiag <sfDir> [reps]
  */
object RetrDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; math.rint((System.nanoTime() - t0) / 1e6) / 1000
    }
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    val idxDir = java.nio.file.Files.createTempDirectory("bm25diag").toFile.getAbsolutePath
    Retrieval.publishBm25(Retrieval.buildBm25Index(spark, dir), idxDir)
    val idx = Retrieval.loadBm25(spark, idxDir)
    val queries = Tables.documents(spark, dir)
      .filter(col("doc_id") < Retrieval.NumQueries)
      .select(col("doc_id").as("query_id"), col("text")).cache()
    queries.count()

    // replicate scoreQueries' vocabulary derivation
    val qtoks = queries.select(col("query_id"),
      posexplode(split(lower(col("text")), " ")).as(Seq("pos", "term")))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(asc("fpos"), asc("term"))
    val qterms = qtoks.groupBy("query_id", "term").agg(min("pos").as("fpos"))
      .withColumn("qrk", row_number().over(wq))
      .filter(col("qrk") <= Retrieval.QueryTerms)
      .select("query_id", "term")
    val vocab = qterms.select("term").distinct().collect().map(_.getString(0))
    val tbs = vocab.map(Retrieval.termBucketOf).distinct.toSeq
    val prunedScan = idx.postings
      .filter(col("tb").isin(tbs.map(Integer.valueOf): _*))
      .filter(col("term").isin(vocab: _*))

    val scanCnt = prunedScan.count()
    val scanT = (1 to reps).map(_ => secs(prunedScan.count()))
    val joinT = (1 to reps).map(_ => secs(
      prunedScan.join(broadcast(qterms), Seq("term")).count()))
    val fullT = (1 to reps).map(_ => secs(
      Retrieval.scoreQueries(queries, idx, excludeSelf = true).count()))

    println("=====RETRDIAG=====")
    println(s"""{"dir":"$dir","vocab":${vocab.length},"buckets":${tbs.length},""" +
      s""""candidate_rows":$scanCnt,""" +
      s""""pruned_scan_s":[${scanT.map(f).mkString(",")}],""" +
      s""""scan_join_s":[${joinT.map(f).mkString(",")}],""" +
      s""""full_serve_s":[${fullT.map(f).mkString(",")}]}""")
    spark.stop()
  }
}
