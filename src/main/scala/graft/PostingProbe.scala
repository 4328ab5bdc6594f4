package graft

/** Posting-family partition-sizing probe (r14 verdict next-round #4).
  *
  * q41 (exact n-gram Jaccard) and q55 (its connected-components
  * consumer) carry the engine's one declared-inherent exchange: the
  * per-shingle posting lists. At the 5M-doc rung the sf30-tuned
  * profile (shuffle.partitions = cores = 32) pushes the posting join's
  * per-partition build state past executor memory — TaskMemoryManager
  * page-allocation retries and GCLocker stalls show up in the log and
  * the pass lists churn 2-3x around the min. The cluster-profile rule
  * in GraftSession's scaladoc ("2-3x executor cores on a real
  * cluster") is exactly the dial that fixes it; this probe measures
  * that rule AT the rung where it starts to matter, so the guidance
  * ships with a number instead of prose.
  *
  * `auto` as the partitions arg exercises the r16 input-size rule
  * (GraftSession.autoShuffled — spark.graft.autoShufflePartitions):
  * the probe then reports the value the rule derived.
  *
  * Usage: runMain graft.PostingProbe <sfDir> <partitions|auto> [reps]
  */
object PostingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val auto = args(1).equalsIgnoreCase("auto")
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)
    val parts =
      if (auto) {
        spark.conf.set("spark.graft.autoShufflePartitions", "true")
        GraftSession.deriveShufflePartitions(
          GraftSession.scanBytes(spark, s"$dir/documents.parquet"), cpus)
      } else try args(1).toInt
      catch {
        case _: NumberFormatException =>
          sys.error(s"usage: PostingProbe <sfDir> <partitions:int|auto> [reps] — got '${args(1)}'")
      }
    if (!auto) spark.conf.set("spark.sql.shuffle.partitions", parts)

    def passes(fn: () => Long): Seq[Double] =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn()
        (System.nanoTime() - t0) / 1e9
      }
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    val q41 = passes(() => graft.operators.Dedup.q41NgramJaccard(spark, dir).count())
    val q55 = passes(() => graft.operators.Dedup.q55DupClusters(spark, dir).count())

    println("=====POSTINGPROBE=====")
    println(s"""{"dir":"$dir","partitions":$parts,"reps":$reps,""" +
      s""""q41_walls_s":[${q41.map(f).mkString(",")}],""" +
      s""""q55_walls_s":[${q55.map(f).mkString(",")}]}""")
    spark.stop()
  }
}
