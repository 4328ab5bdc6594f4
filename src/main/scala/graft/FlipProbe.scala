package graft

/** Co-partitioned-training flip-point probe (r14 verdict next-round #5).
  *
  * The r14 negative result: hash-partitioning the GD loop's xdb/labels
  * checkpoints on doc_id (exchange-free iterations) DOUBLED q129/q135
  * at gen-sf1, because AQE was re-planning the per-iteration small
  * frames into broadcast joins with no shuffle and no sort, while the
  * static co-partitioned SMJ pays per-iteration sorts. The predicted
  * flip is where the per-doc frames outgrow broadcast (~10s of MB).
  *
  * This probe turns that prose into a measured dial: at one corpus dir
  * it runs q129 and q135 with `spark.graft.lr.coPartition` off then on
  * (fresh plans, reps passes each, min quoted), alongside the frame
  * sizes that drive the mechanism (xdb rows, label rows). Run at
  * gen-sf10 and gen-sf30 to bracket (or refute) the crossover.
  *
  * Usage: runMain graft.FlipProbe <sfDir> [reps]
  */
object FlipProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)
    import org.apache.spark.sql.functions._

    // frame sizes (mechanism anchor): rows of the two checkpointed
    // frames the dial repartitions
    val docs = Tables.documents(spark, dir)
    val xdbRows = graft.operators.LrTrain.docTokFrom(docs)
      .groupBy("doc_id", "bucket").agg(count(lit(1))).count()
    val labelRows = docs.count()

    def passes(name: String, fn: () => Long): Seq[Double] =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn()
        (System.nanoTime() - t0) / 1e9
      }
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def runBoth(q: String, fn: () => Long): String = {
      spark.conf.unset("spark.graft.lr.coPartition")
      val base = passes(q, fn)
      spark.conf.set("spark.graft.lr.coPartition", "true")
      val copart = passes(q, fn)
      // the r16 auto dial: decide on the materialized token frame's
      // row count against copartRows (default 50M) — at rungs past
      // the measured crossover this must pick the copart path
      spark.conf.set("spark.graft.lr.coPartition", "auto")
      graft.operators.LrTrain.lastCoPartDecision.set(None)
      val auto = passes(q, fn)
      val decision = graft.operators.LrTrain.lastCoPartDecision.get()
      spark.conf.unset("spark.graft.lr.coPartition")
      s""""$q":{"baseline_s":[${base.map(f).mkString(",")}],""" +
        s""""copartitioned_s":[${copart.map(f).mkString(",")}],""" +
        s""""auto_s":[${auto.map(f).mkString(",")}],""" +
        s""""auto_decision":"${decision.map(_.toString).getOrElse("none")}"}"""
    }

    val q129 = runBoth("q129",
      () => graft.operators.LrTrain.q129LrTrain(spark, dir).count())
    val q135 = runBoth("q135",
      () => graft.operators.LrTrain.q135LrBalanced(spark, dir).count())

    println("=====FLIPPROBE=====")
    println(s"""{"dir":"$dir","reps":$reps,"label_rows":$labelRows,""" +
      s""""xdb_rows":$xdbRows,$q129,$q135}""")
    spark.stop()
  }
}
