package graft

/** Reproduces the BENCH_R13_Q109_CAP artifact: runs q109 at one gen
  * dir with the occupancy cap off and on, collects the overflow-cell
  * report, and proves capped ⊆ uncapped on the actual pair sets
  * (`except` count = 0). Calm timing lives in Bench/Diag runs; this
  * records the cap SEMANTICS at scale, where the spec's sf0.01 corpus
  * has no dense tail to exercise.
  * Usage: runMain graft.CapProbe <sfDir> <cap>
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cap = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)
    import spark.implicits._

    spark.conf.unset("spark.graft.rplsh.maxOcc")
    val t0 = System.nanoTime()
    val uncapped = graft.operators.Dedup.q109EmbedLsh(spark, dir)
      .select("v1", "v2").cache()
    val nUncapped = uncapped.count()
    val tUncapped = (System.nanoTime() - t0) / 1e9

    spark.conf.set("spark.graft.rplsh.maxOcc", cap)
    val t1 = System.nanoTime()
    val capped = graft.operators.Dedup.q109EmbedLsh(spark, dir)
      .select("v1", "v2").cache()
    val nCapped = capped.count()
    val tCapped = (System.nanoTime() - t1) / 1e9
    val extra = capped.except(uncapped).count() // must be 0: subset proof
    val report = graft.operators.Dedup.q109OverflowCells(spark, dir)
      .orderBy(org.apache.spark.sql.functions.desc("occ"))
    val cells = report.collect()
    val occs = cells.map(_.getAs[Long]("occ"))

    println("=====CAPPROBE=====")
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    println(s"""{"dir":"$dir","cap":$cap,"uncapped_pairs":$nUncapped,"capped_pairs":$nCapped,""" +
      s""""capped_minus_uncapped":$extra,"dropped_pairs":${nUncapped - nCapped},""" +
      s""""uncapped_first_pass_s":${f(tUncapped)},"capped_first_pass_s":${f(tCapped)},""" +
      s""""overflow_cells":${cells.length},"overflow_rows":${occs.sum},""" +
      s""""overflow_occ_top10":[${occs.take(10).mkString(",")}]}""")
    spark.stop()
  }
}
