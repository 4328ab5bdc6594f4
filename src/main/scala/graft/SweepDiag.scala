package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Registry-wide duplicate-exchange screen (r17 optimization round):
  * run queries in ONE JVM (2 passes each, second pass's stage table is
  * the record), and flag queries whose executed stages contain two or
  * more DISTINCT stages writing the SAME nonzero shuffle byte count —
  * the signature of an identical subtree that AQE stage reuse failed to
  * dedup (the q148 dl/stats defect class: an optimizer-inferred
  * IsNotNull on one branch breaks canonical equality). Equal sizes can
  * be coincidence; the flag is a screen, adjudicated by reading the
  * plan. Usage: runMain graft.SweepDiag <sfDir> <outJson> [names...]
  */
object SweepDiag {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SweepDiag <sfDir> <outJson> [names...]")
    val sfDir = args(0)
    val outPath = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)

    case class Row(stageId: Int, tasks: Int, runMs: Long, cpuMs: Long,
        shufReadB: Long, shufWriteB: Long)
    val stages = ArrayBuffer.empty[Row]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += Row(si.stageId, si.numTasks, m.executorRunTime,
            m.executorCpuTime / 1000000,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach(t => try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () })

    // SparkListener events arrive asynchronously (r17 ADVICE): clearing
    // right after the warm pass or snapshotting right after the timed
    // pass can misattribute late StageCompleted events. Poll the buffer
    // until it is stable for ~300 ms before clearing/snapshotting.
    def drainBus(): Unit = {
      var prev = -1
      var stable = 0
      while (stable < 2) {
        val n = stages.synchronized(stages.size)
        if (n == prev) stable += 1 else { stable = 0; prev = n }
        Thread.sleep(150)
      }
    }
    val results = names.map { n =>
      val fn = SparkEntry.queries(n)
      try {
        fn(spark, sfDir).count() // warm pass (codegen/JIT)
        drainBus()
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        drainBus()
        val rows = stages.synchronized(stages.toVector)
        val dups = rows.filter(_.shufWriteB > 0).groupBy(_.shufWriteB)
          .filter(_._2.size > 1).toSeq.sortBy(-_._1)
        val flag = dups.nonEmpty
        println(f"[sweep] $n%-28s wall=$wall%7.3f stages=${rows.size}%3d " +
          s"dupWriters=${dups.map { case (b, rs) => s"${rs.size}x${b}B" }.mkString(",")}")
        (n, wall, rows, dups, flag, "")
      } catch {
        case e: Throwable =>
          println(s"[sweep] $n FAILED: ${e.getMessage}")
          (n, -1.0, Vector.empty[Row], Seq.empty[(Long, Vector[Row])], false,
            String.valueOf(e.getMessage))
      }
    }
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val json = results.map { case (n, w, rows, dups, flag, err) =>
      // top stages by CPU ride along for the map-CPU audit (r14 rule:
      // huge cpuMs against hash-only shuffle bytes = per-row work that
      // belongs in a native expression)
      val top = rows.sortBy(-_.cpuMs).take(3).map(r =>
        s"""{"stage":${r.stageId},"tasks":${r.tasks},"runMs":${r.runMs},""" +
        s""""cpuMs":${r.cpuMs},"shufReadB":${r.shufReadB},"shufWriteB":${r.shufWriteB}}""")
      // JSON-escape the error so a failed query's cause lands in the
      // artifact, not just wall=-1 (r17 ADVICE)
      val errJson = "\"" + String.valueOf(err)
        .replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
      s"""{"query":"$n","wall":${fmt(w)},"stages":${rows.size},""" +
      s""""sumRunMs":${rows.map(_.runMs).sum},"sumCpuMs":${rows.map(_.cpuMs).sum},""" +
      s""""dupFlag":$flag,"err":$errJson,""" +
      s""""dupWriters":[${dups.map { case (b, rs) =>
        s"""{"bytes":$b,"stages":[${rs.map(_.stageId).mkString(",")}]}"""
      }.mkString(",")}],"topCpuStages":[${top.mkString(",")}]}"""
    }.mkString("[\n", ",\n", "\n]")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
