package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Single-query bisection harness (the round-7 q103/q104 playbook, made
  * reusable): run one registry query N times and capture what the bench
  * total can't show — the AQE-final executed plan, and per-stage task
  * metrics (task count, spill, GC, run time, max single-task time). This
  * is how a stable-but-unexplained per-query cost gets attributed: spill
  * vs partition collapse vs codegen fallback vs plain box load.
  *
  * Per pass it also records the JVM's JIT-compile-time delta, executor
  * CPU time, and Spark's codegen counters (Janino compile count, max
  * generated METHOD bytecode). These separated the round-13 gen-sf1
  * "q103 14x" mover into its two real parts: identical stage I/O with
  * 11x the CPU and a jit delta ~= the wall (the pass ran inside the
  * JVM's compile/deopt churn window — local[32] task threads racing
  * the compiler for the same 32 vCPUs), decaying to a steady state at
  * r10 parity by pass ~4. Method bytecode staying well under
  * HotSpot's 8000-byte JIT refusal limit and a flat Janino count rule
  * out codegen fallback and cache misses in one read.
  *
  * Usage: runMain graft.Diag <queryName> [sfDir] [reps] [outPath]
  */
object Diag {
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val out = if (args.length > 3) Some(args(3)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)

    case class StageRow(stageId: Int, name: String, tasks: Int,
        runTimeMs: Long, cpuMs: Long, gcMs: Long, maxTaskMs: Long,
        memSpill: Long, diskSpill: Long, shufReadB: Long, shufWriteB: Long)
    val stages = ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n'),
            si.numTasks, m.executorRunTime, m.executorCpuTime / 1000000,
            m.jvmGCTime,
            -1L, // per-task max needs onTaskEnd; stage totals suffice here
            m.memoryBytesSpilled, m.diskBytesSpilled,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    // JVM/codegen counters: jitMs is the process-wide accumulated JIT
    // compiler time (all compiler threads); a per-pass delta comparable
    // to the pass wall means the pass ran inside the compile/deopt churn
    // window and its timing is warmup, not plan cost. janinoCompiles
    // flat across passes = codegen cache hits (no re-generation);
    // maxMethodBytecode < 8000 = HotSpot will JIT every generated method.
    val jitBean = java.lang.management.ManagementFactory.getCompilationMXBean
    def jitMs(): Long =
      if (jitBean != null && jitBean.isCompilationTimeMonitoringSupported)
        jitBean.getTotalCompilationTime else -1L
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    def janinoCompiles(): Long = cg.METRIC_COMPILATION_TIME.getCount
    def maxMethodBytecode(): Long =
      cg.METRIC_GENERATED_METHOD_BYTECODE_SIZE.getSnapshot.getMax
    // same warmup as Bench so timings are comparable
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach(t => try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () })

    val fn = SparkEntry.queries(name)
    val passes = (1 to reps).map { i =>
      stages.synchronized(stages.clear())
      val jit0 = jitMs()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val jitDelta = jitMs() - jit0
      val plan = df.queryExecution.executedPlan.toString
      val rows = stages.synchronized(stages.toVector)
      System.err.println(f"== pass $i: $wall%.3f s, ${rows.size} stages, jit=${jitDelta} ms, janino=${janinoCompiles()}, maxMethodB=${maxMethodBytecode()} ==")
      rows.sortBy(-_.runTimeMs).take(8).foreach { r =>
        System.err.println(f"  stage ${r.stageId}%4d tasks=${r.tasks}%4d run=${r.runTimeMs}%6d ms cpu=${r.cpuMs}%6d ms gc=${r.gcMs}%5d ms memSpill=${r.memSpill} diskSpill=${r.diskSpill} shufR=${r.shufReadB} shufW=${r.shufWriteB} ${r.name.take(60)}")
      }
      (wall, jitDelta, rows, plan)
    }
    val walls = passes.map(_._1)
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val agg = passes.last._3
    val json =
      s"""{"query":"$name","sf":"$sfDir","cpus":$cpus,"passes":[${walls.map(fmt).mkString(",")}],""" +
      s""""jitCompileMsPerPass":[${passes.map(_._2).mkString(",")}],""" +
      s""""janinoCompilesTotal":${janinoCompiles()},"maxGeneratedMethodBytecode":${maxMethodBytecode()},""" +
      s""""lastPassStages":[${agg.map(r =>
        s"""{"stage":${r.stageId},"tasks":${r.tasks},"runMs":${r.runTimeMs},"cpuMs":${r.cpuMs},"gcMs":${r.gcMs},"memSpill":${r.memSpill},"diskSpill":${r.diskSpill},"shufReadB":${r.shufReadB},"shufWriteB":${r.shufWriteB}}""").mkString(",")}],""" +
      s""""plan":${jstr(passes.last._4)}}"""
    out.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p), (json + "\n").getBytes("UTF-8"))
    }
    println(json.take(4000))
    spark.stop()
  }
}
