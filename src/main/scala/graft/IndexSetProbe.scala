package graft

import org.apache.spark.sql.functions._

import graft.operators.{IndexSet, Retrieval}

/** Scale rung for the versioned index set (r17 — the landing-round
  * measurement discipline): times the full lifecycle at a multi-M rung
  * — publish, snapshot serve (fused + with content), append, the
  * pinned pre-append snapshot re-serve, delete, compact, vacuum — and
  * checks the version/row invariants as it goes.
  *
  * Usage: runMain graft.IndexSetProbe <tableDir> <root> [reps]
  * (tableDir needs documents.parquet + embeddings.parquet)
  */
object IndexSetProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val root = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def secs(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val vecs = Tables.embeddings(spark, dir)
    val baseD = docs.filter(col("doc_id") % 100 =!= 0)
    val baseV = vecs.filter(col("vec_id") % 100 =!= 0)
    val arrD = docs.filter(col("doc_id") % 100 === 0) // a 1% ingest batch
    val arrV = vecs.filter(col("vec_id") % 100 === 0)
    val requests = docs.filter(col("doc_id") < Retrieval.NumQueries)
      .select(col("doc_id").as("query_id"), col("text"))
      .join(vecs.select(col("vec_id").as("query_id"),
        col("embedding").as("pvec")), Seq("query_id"))

    val publishS = secs(IndexSet.publish(spark, baseD, baseV, root))
    val snap1 = IndexSet.loadSnapshot(spark, root)
    def fusedCount(snap: IndexSet.HybridSnapshot): Long =
      graft.streaming.HybridServe.fusedFromSnapshot(requests, snap).count()
    val serve1 = (1 to reps).map(_ => secs(require(fusedCount(snap1) > 0)))
    val fetchS = (1 to reps).map(_ => secs(require(
      graft.streaming.HybridServe.fusedWithContent(requests, snap1).count() > 0)))
    val appendS = secs(IndexSet.append(spark, arrD, arrV, root))
    // the pinned snapshot keeps serving v1 while v2 is current
    val pinnedS = secs(require(fusedCount(snap1) > 0))
    val snap2 = IndexSet.loadSnapshot(spark, root)
    require(snap2.manifest.corpusVersion == 2L)
    val serve2 = (1 to reps).map(_ => secs(require(fusedCount(snap2) > 0)))
    val victims = (1L to 100000L).map(_ * 7L).filter(_ % 100 != 0).take(1000)
    val deleteS = secs(IndexSet.delete(spark, victims, root))
    val compactS = secs(IndexSet.compact(spark, root))
    val snap4 = IndexSet.loadSnapshot(spark, root)
    require(snap4.manifest.corpusVersion == 3L,
      s"compaction must not bump corpusVersion: ${snap4.manifest.corpusVersion}")
    val serve4 = (1 to reps).map(_ => secs(require(fusedCount(snap4) > 0)))
    val vacuumed = IndexSet.vacuum(spark, root)

    println("=====IXSETPROBE=====")
    println(s"""{"dir":"$dir","reps":$reps,""" +
      s""""n_docs":${snap2.manifest.nDocs},""" +
      s""""publish_s":${f(publishS)},""" +
      s""""serve_v1_s":[${serve1.map(f).mkString(",")}],""" +
      s""""serve_with_content_s":[${fetchS.map(f).mkString(",")}],""" +
      s""""append_1pct_s":${f(appendS)},""" +
      s""""pinned_snapshot_serve_s":${f(pinnedS)},""" +
      s""""serve_v2_s":[${serve2.map(f).mkString(",")}],""" +
      s""""delete_1k_s":${f(deleteS)},""" +
      s""""compact_s":${f(compactS)},""" +
      s""""serve_postcompact_s":[${serve4.map(f).mkString(",")}],""" +
      s""""vacuumed_dirs":${vacuumed.size}}""")
    spark.stop()
  }
}
