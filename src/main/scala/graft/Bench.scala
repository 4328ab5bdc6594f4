package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)
    // warm the JVM/codegen/file-index paths so the first timed query
    // doesn't absorb session startup (untimed; tolerate missing tables)
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach(t => try Tables.load(spark, sfDir, t).count()
        catch { case e: Throwable => System.err.println(s"[bench] warmup $t: ${e.getMessage}") })

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    only.foreach(_.diff(SparkEntry.queries.keySet).foreach(n =>
      System.err.println(s"[bench] WARNING: unknown query in SPARK_GRAFT_ONLY: $n")))
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // ordered Seq (not a Map) so the emitted JSON keys are stable run-to-run
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // release the previous query's broadcast/shuffle references — the
      // ContextCleaner only frees them after a driver GC, and 40 queries
      // of accumulated state otherwise taxes the tail of the run
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> -1.0 // sentinel: failed queries must not look like timings
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
