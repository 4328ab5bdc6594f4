package graft

import org.apache.spark.sql.functions._

import graft.operators.{IndexSet, Quantize, Retrieval}

/** Same-window bisection of the manifest layer's serve cost (r17 round
  * delta, open item (c)): publishes the standalone flat-layout
  * artifacts (the r16 shape — publishBm25 + publishIndex) and the
  * manifest-committed index set (r17 — segmented seg=/gen= dirs behind
  * a versioned manifest) over the SAME corpus in ONE JVM, then measures
  * their serve floors INTERLEAVED (A B A B …) so page-cache and host
  * state cannot be attributed to either side. The r17 closing ledgers
  * could not make this comparison across rounds: BM25 serve floors
  * swing 1.5–1.8× with page-cache state after big publishes, so the
  * "manifest adds version safety at no serve cost" claim needed a
  * same-window pair. Both sides run the SAME fused/scoring code
  * (HybridServe.fused); the only difference is which storage layout
  * the component frames read — exactly the layer under test.
  *
  * Usage: runMain graft.BisectProbe <tableDir> <workDir> [reps]
  * (tableDir needs documents.parquet + embeddings.parquet)
  */
object BisectProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val work = args(1)
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def secs(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def arr(xs: Seq[Double]) = xs.map(f).mkString("[", ",", "]")

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val vecs = Tables.embeddings(spark, dir)
    val requests = docs.filter(col("doc_id") < Retrieval.NumQueries)
      .select(col("doc_id").as("query_id"), col("text"))
      .join(vecs.select(col("vec_id").as("query_id"),
        col("embedding").as("pvec")), Seq("query_id"))

    // r16 shape: two standalone flat-layout artifacts
    val flatBm25S = secs(Retrieval.publishBm25(
      Retrieval.buildBm25IndexFrom(docs), s"$work/bm25flat"))
    val flatPqS = secs(Quantize.publishIndex(
      Quantize.buildIndexFrom(vecs), s"$work/pqflat"))
    val lex = Retrieval.loadBm25(spark, s"$work/bm25flat")
    val sem = Quantize.loadIndex(spark, s"$work/pqflat")

    // r17 shape: one manifest-committed index set
    val ixSetS = secs(IndexSet.publish(spark, docs, vecs, s"$work/ixset"))
    val snap = IndexSet.loadSnapshot(spark, s"$work/ixset")

    def flatFused(): Double =
      secs(require(graft.streaming.HybridServe.fused(requests, lex, sem).count() > 0))
    def snapFused(): Double =
      secs(require(graft.streaming.HybridServe.fusedFromSnapshot(requests, snap).count() > 0))
    def flatLex(): Double = secs(require(Retrieval.scoreQueries(
      requests.select("query_id", "text"), lex).count() > 0))
    def snapLex(): Double = secs(require(Retrieval.scoreQueries(
      requests.select("query_id", "text"), snap.bm25).count() > 0))

    // one untimed warm pass per side (plan compile + codegen), then the
    // interleaved timed pairs
    flatFused(); snapFused(); flatLex(); snapLex()
    val pairsFused = (1 to reps).map(_ => (flatFused(), snapFused()))
    val pairsLex = (1 to reps).map(_ => (flatLex(), snapLex()))

    val ctl = (1 to 3).map(_ => secs(
      SparkEntry.queries("q22_clean_numeric")(spark, "/root/testdata/sf0.1").count()))

    println(s"""{"metric":"bisect_flat_vs_manifest_serve","unit":"sec",""" +
      s""""dataset":"$dir","reps":$reps,""" +
      s""""publish_flat_bm25":${f(flatBm25S)},"publish_flat_pq":${f(flatPqS)},""" +
      s""""publish_indexset":${f(ixSetS)},""" +
      s""""fused_flat":${arr(pairsFused.map(_._1))},""" +
      s""""fused_snapshot":${arr(pairsFused.map(_._2))},""" +
      s""""lex_flat":${arr(pairsLex.map(_._1))},""" +
      s""""lex_snapshot":${arr(pairsLex.map(_._2))},""" +
      s""""control_q22":${arr(ctl)}}""")
    spark.stop()
  }
}
