package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Times ONE publishBm25 (build + stage + derive df + stats) with
  * per-stage task metrics — the harness for the r17
  * derive-from-staged-postings A/B: each invocation is its own JVM so
  * both code shapes pay the same cold start, and runs interleave in
  * one window. The stage table attributes the wall to scan vs shuffle
  * vs write, which single totals cannot (publish walls at the 1.5M-doc
  * rung swing ±40% with page-cache state).
  * Usage: runMain graft.PublishProbe <tableDir> <outDir>
  */
object PublishProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // conf overrides for A/B legs (the Bench convention, same loud
    // parsing): r18 uses it for the lz4-vs-zstd publish repricing.
    // Entries are applied as SYSTEM PROPERTIES before the context is
    // built — core confs like spark.io.compression.codec are fixed at
    // SparkEnv creation and a runtime conf.set would silently no-op —
    // then re-applied at runtime where modifiable (SQL confs).
    val overrides = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.nonEmpty => (k, v)
          case _ => sys.error(s"[probe] malformed SPARK_GRAFT_CONF entry: '$kv'")
        }
      }
    overrides.foreach { case (k, v) => sys.props(k) = v }
    val spark = GraftSession(s"local[$cpus]", cpus)
    overrides.foreach { case (k, v) =>
      try spark.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () } // static; sys-prop applied it
    }
    case class Row(id: Int, tasks: Int, runMs: Long, cpuMs: Long,
        inB: Long, outB: Long, shufR: Long, shufW: Long, spill: Long)
    val stages = ArrayBuffer.empty[Row]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        stages.synchronized {
          stages += Row(si.stageId, si.numTasks, m.executorRunTime,
            m.executorCpuTime / 1000000,
            m.inputMetrics.bytesRead, m.outputMetrics.bytesWritten,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.memoryBytesSpilled + m.diskBytesSpilled)
        }
      }
    })
    val t0 = System.nanoTime()
    graft.operators.Retrieval.publishBm25(
      graft.operators.Retrieval.buildBm25Index(spark, args(0)), args(1))
    val s = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // let the listener bus drain
    println(f"""{"metric":"publish_bm25","sec":$s%.2f,"dataset":"${args(0)}"}""")
    stages.sortBy(-_.runMs).take(12).foreach(r =>
      println(f"stage ${r.id}%3d tasks=${r.tasks}%3d run=${r.runMs}%7d ms " +
        f"cpu=${r.cpuMs}%7d in=${r.inB / 1000000}%5dMB out=${r.outB / 1000000}%5dMB " +
        f"shufR=${r.shufR / 1000000}%5dMB shufW=${r.shufW / 1000000}%5dMB " +
        f"spill=${r.spill / 1000000}%5dMB"))
    spark.stop()
  }
}
