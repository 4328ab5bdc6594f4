package graft

import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for registry queries to files — the
  * optimization-round plan ledger (plans/rNN/<query>_<suffix>.txt).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [sfDir] [names...]
  * With no names, dumps every registry query. Queries whose operators
  * fit bounded state eagerly (trainers, index fits) run those jobs at
  * the given sfDir during construction; the dumped plan is the final
  * declared DataFrame's initial (pre-AQE) physical plan, which is what
  * the plan-shape claims in OPTIMIZATION notes reference.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [sfDir] [names...]")
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession("local[8]", 8)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val mode = ExplainMode.fromString("formatted")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val s = df.queryExecution.explainString(mode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$n$suffix.txt"),
          s.getBytes("UTF-8"))
        println(s"[plandump] $n ok (${s.length} chars)")
      } catch {
        case e: Throwable => println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
