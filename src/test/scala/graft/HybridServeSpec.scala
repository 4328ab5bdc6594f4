package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Quantize, Retrieval}
import graft.streaming.HybridServe

/** The hybrid-serve capstone: requests answered from the two PUBLISHED
  * indexes and fused in rank space. Three legs: (1) the streamed fused
  * top-k equals the batch composition bit-for-bit across a batch
  * split; (2) the batch composition recomputes from its two per-
  * retriever rank lists (the q149 RRF check applied to the serve
  * path); (3) both sides genuinely contribute.
  */
class HybridServeSpec extends GraftSpec {

  case class Req(query_id: Long, text: String, pvec: Seq[Float])

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  // requests = corpus docs joined to their embeddings (doc_id and
  // vec_id enumerate the same 0..n-1 space per the q149 convention)
  private def requests = Tables.documents(spark, sfDir)
    .filter(col("doc_id") < Retrieval.NumQueries)
    .select(col("doc_id").as("query_id"), col("text"))
    .join(Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("query_id"), col("embedding").as("pvec")),
      Seq("query_id"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "rk", "cand_id", "rrf_u").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("streamed hybrid fusion over published indexes equals batch across a split") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    // publish both artifacts, serve from the LOADED forms — the full
    // production path, never the in-memory fits
    val lexDir = tmp("hyb_lex"); val semDir = tmp("hyb_sem")
    Retrieval.publishBm25(Retrieval.buildBm25Index(spark, sfDir), lexDir)
    Quantize.publishIndex(Quantize.buildIndex(spark, sfDir), semDir)
    val lex = Retrieval.loadBm25(spark, lexDir)
    val sem = Quantize.loadIndex(spark, semDir)

    val expected = rows(HybridServe.fused(requests, lex, sem, excludeSelf = true))
    assert(expected.nonEmpty)

    val all = requests.collect()
      .map(r => Req(r.getLong(0), r.getString(1), r.getSeq[Float](2)))
    val (b1, b2) = all.partition(_.query_id % 2 == 0)
    assert(b1.nonEmpty && b2.nonEmpty)
    val sink = tmp("hyb_sink") + "/fused"
    val stream = MemoryStream[Req]
    val q = HybridServe.serve(stream.toDF(), lex, sem, sink, excludeSelf = true)
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = rows(spark.read.parquet(sink))
    assert(got === expected,
      s"stream-only=${(got -- expected).take(5)} batch-only=${(expected -- got).take(5)}")
  }

  test("fused serve recomputes from the two per-retriever serve lists") {
    val lex = Retrieval.buildBm25Index(spark, sfDir)
    val sem = Quantize.buildIndex(spark, sfDir)
    val lexM = Retrieval.scoreQueries(
        requests.select("query_id", "text"), lex, excludeSelf = true)
      .select("query_id", "doc_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val semM = Quantize.probeTopK(
        requests.select(col("query_id").as("probe_id"), col("pvec")), sem)
      .select("probe_id", "vec_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = HybridServe.fused(requests, lex, sem, excludeSelf = true).collect()
    def contrib(rk: Option[Long]): Long = rk
      .map(r => math.round(1e6 / (Retrieval.RrfK + r))).getOrElse(0L)
    got.map(_.getLong(0)).distinct.foreach { q =>
      val cands = (lexM.keys ++ semM.keys).filter(_._1 == q).map(_._2).toSeq.distinct
      val want = cands
        .map(c => (c, contrib(lexM.get((q, c))) + contrib(semM.get((q, c)))))
        .sortBy { case (c, s) => (-s, c) }.take(Retrieval.TopK)
      val gotQ = got.filter(_.getLong(0) == q).sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getLong(3))).toSeq
      assert(gotQ === want, s"hybrid-serve RRF drift for query $q")
    }
    // both retrievers contribute rows the other lacks
    assert(got.exists(r => !r.isNullAt(4) && r.isNullAt(5)), "no lexical-only rows")
    assert(got.exists(r => r.isNullAt(4) && !r.isNullAt(5)), "no semantic-only rows")
  }
}
