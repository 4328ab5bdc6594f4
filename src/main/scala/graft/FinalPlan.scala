package graft

/** Execute registry queries and print the FINAL adaptive plan — the
  * only place exchange/stage reuse is visible under AQE (the initial
  * plan shows duplicate subtrees that the runtime may or may not
  * dedup). Usage: runMain graft.FinalPlan <sfDir> <name> [name...]
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FinalPlan <sfDir> <name> [name...]")
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)
    args.tail.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      // execute THIS queryExecution (count() would build a separate one
      // and leave this AdaptiveSparkPlan unfinalized)
      df.queryExecution.executedPlan.executeCollect()
      val p = df.queryExecution.executedPlan.toString
      val out = sys.env.get("FINALPLAN_DIR")
      out.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"$n.txt"), p.getBytes("UTF-8"))
      }
      def c(s: String) = s.r.findAllIn(p).length
      // distinct vs total ShuffleQueryStage ids: total > distinct means
      // runtime stage reuse fired; equal-but-multiple identical-looking
      // subtrees is the defect signature this probe hunts
      val ids = "ShuffleQueryStage ([0-9]+)".r.findAllMatchIn(p).map(_.group(1)).toList
      val bids = "BroadcastQueryStage ([0-9]+)".r.findAllMatchIn(p).map(_.group(1)).toList
      println(s"[finalplan] $n scans=${c("Scan parquet")} " +
        s"shuffleRefs=${ids.length} shuffleStages=${ids.distinct.length} " +
        s"bcastRefs=${bids.length} bcastStages=${bids.distinct.length}")
    }
    spark.stop()
  }
}
