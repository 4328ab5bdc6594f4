package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Quantize, Retrieval}
import graft.streaming.HybridServe

/** r17 verdict item 7: the duplicate-exchange + map-CPU screen
  * (SweepDiag) extended to the SERVING surface, which the batch-registry
  * sweep never covers. Publishes the two retrieval artifacts once from
  * the given corpus dir, then runs each serve-path READ (the per-request
  * computation a production micro-batch pays) twice in one JVM — the
  * second pass's stage table is the record — and flags distinct stages
  * writing identical nonzero shuffle byte counts (the q148 defect class)
  * plus the top-CPU stages. Paths screened: BM25 scoring, PQ/IVFADC
  * probing, hybrid RRF fusion over both, and the retrieve→fetch content
  * form. Usage: runMain graft.ServeDiag <sfDir> <outJson>
  */
object ServeDiag {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ServeDiag <sfDir> <outJson>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)

    case class SRow(stageId: Int, tasks: Int, runMs: Long, cpuMs: Long,
        shufReadB: Long, shufWriteB: Long)
    val stages = ArrayBuffer.empty[SRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += SRow(si.stageId, si.numTasks, m.executorRunTime,
            m.executorCpuTime / 1000000,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    def drainBus(): Unit = {
      var prev = -1; var stable = 0
      while (stable < 2) {
        val n = stages.synchronized(stages.size)
        if (n == prev) stable += 1 else { stable = 0; prev = n }
        Thread.sleep(150)
      }
    }

    // one-time publish (NOT screened — PublishProbe owns the publish
    // path); serving reads the LOADED artifacts, the production shape
    val base = java.nio.file.Files.createTempDirectory("graft_servediag")
    val lexDir = base.resolve("lex").toString
    val semDir = base.resolve("sem").toString
    Retrieval.publishBm25(Retrieval.buildBm25Index(spark, sfDir), lexDir)
    Quantize.publishIndex(Quantize.buildIndex(spark, sfDir), semDir)
    val lex = Retrieval.loadBm25(spark, lexDir)
    val sem = Quantize.loadIndex(spark, semDir)
    val requests = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < Retrieval.NumQueries)
      .select(col("doc_id").as("query_id"), col("text"))
      .join(Tables.embeddings(spark, sfDir)
        .select(col("vec_id").as("query_id"), col("embedding").as("pvec")),
        Seq("query_id"))
      .localCheckpoint()

    val paths: Seq[(String, () => DataFrame)] = Seq(
      "bm25_score" -> (() =>
        Retrieval.scoreQueries(requests.select("query_id", "text"), lex,
          excludeSelf = true)),
      "pq_probe" -> (() =>
        Quantize.probeTopK(
          requests.select(col("query_id").as("probe_id"), col("pvec")), sem,
          excludeSelf = true)),
      "hybrid_fused" -> (() =>
        HybridServe.fused(requests, lex, sem, excludeSelf = true))
    )

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val results = paths.map { case (name, fn) =>
      try {
        fn().count() // warm pass (codegen/JIT)
        drainBus()
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        fn().count()
        val wall = (System.nanoTime() - t0) / 1e9
        drainBus()
        val rows = stages.synchronized(stages.toVector)
        val dups = rows.filter(_.shufWriteB > 0).groupBy(_.shufWriteB)
          .filter(_._2.size > 1).toSeq.sortBy(-_._1)
        println(f"[servediag] $name%-22s wall=$wall%7.3f stages=${rows.size}%3d " +
          s"dupWriters=${dups.map { case (b, rs) => s"${rs.size}x${b}B" }.mkString(",")}")
        (name, wall, rows, dups, "")
      } catch {
        case e: Throwable =>
          println(s"[servediag] $name FAILED: ${e.getMessage}")
          (name, -1.0, Vector.empty[SRow], Seq.empty[(Long, Vector[SRow])],
            String.valueOf(e.getMessage))
      }
    }
    val json = results.map { case (n, w, rows, dups, err) =>
      val top = rows.sortBy(-_.cpuMs).take(3).map(r =>
        s"""{"stage":${r.stageId},"tasks":${r.tasks},"runMs":${r.runMs},""" +
        s""""cpuMs":${r.cpuMs},"shufReadB":${r.shufReadB},"shufWriteB":${r.shufWriteB}}""")
      val errJson = "\"" + err.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
      s"""{"path":"$n","wall":${fmt(w)},"stages":${rows.size},""" +
      s""""sumRunMs":${rows.map(_.runMs).sum},"sumCpuMs":${rows.map(_.cpuMs).sum},""" +
      s""""dupFlag":${dups.nonEmpty},"err":$errJson,""" +
      s""""dupWriters":[${dups.map { case (b, rs) =>
        s"""{"bytes":$b,"stages":[${rs.map(_.stageId).mkString(",")}]}"""
      }.mkString(",")}],"topCpuStages":[${top.mkString(",")}]}"""
    }.mkString("[\n", ",\n", "\n]")
    java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
