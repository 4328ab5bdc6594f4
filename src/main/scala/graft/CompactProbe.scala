package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Compaction rung probe (r16): price the surgical compactBm25 against
  * the full republish it replaces. Publishes a base index, appends two
  * ingest batches (accreting files per touched partition), then times
  * the multi-file-partitions-only rewrite; the republish reference is
  * the fresh publish the same data would otherwise need.
  *
  * Usage: runMain graft.CompactProbe <sfDir>
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      math.rint((System.nanoTime() - t0) / 1e6) / 1000
    }
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val out = java.nio.file.Files.createTempDirectory("bm25cprobe").toFile.getAbsolutePath
    val publishS = secs(Retrieval.publishBm25(
      Retrieval.buildBm25IndexFrom(docs.filter(col("doc_id") % 3 === 0)), out))
    val append1S = secs(Retrieval.appendToBm25(spark,
      docs.filter(col("doc_id") % 3 === 1), out))
    val append2S = secs(Retrieval.appendToBm25(spark,
      docs.filter(col("doc_id") % 3 === 2), out))
    val multiBefore = graft.sources.PartitionSwap
      .multiFilePartitions(spark, s"$out/postings").size
    val idx = Retrieval.loadBm25(spark, out)
    val queries = docs.filter(col("doc_id") < Retrieval.NumQueries)
      .select(col("doc_id").as("query_id"), col("text"))
    val serveFragmented = secs(require(
      Retrieval.scoreQueries(queries, idx, excludeSelf = true).count() > 0))
    val compactS = secs(Retrieval.compactBm25(spark, out))
    val idx2 = Retrieval.loadBm25(spark, out)
    val serveCompacted = secs(require(
      Retrieval.scoreQueries(queries, idx2, excludeSelf = true).count() > 0))
    val republishS = secs(Retrieval.publishBm25(
      Retrieval.buildBm25IndexFrom(docs), out + "_ref"))

    println("=====COMPACTPROBE=====")
    println(s"""{"dir":"$dir","publish_base_s":${f(publishS)},""" +
      s""""append1_s":${f(append1S)},"append2_s":${f(append2S)},""" +
      s""""multifile_partitions":$multiBefore,""" +
      s""""serve_fragmented_s":${f(serveFragmented)},""" +
      s""""compact_s":${f(compactS)},""" +
      s""""serve_compacted_s":${f(serveCompacted)},""" +
      s""""full_republish_s":${f(republishS)}}""")
    spark.stop()
  }
}
