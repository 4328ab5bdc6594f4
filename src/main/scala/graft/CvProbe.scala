package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Classify, LrTrain}

/** Scratch probe for the r18 q138 batched-folds chain: builds ONE
  * iteration's gradient-update frame exactly as gdStep does with
  * modelKey (tf, side) and prints the plan + timings, so the eager
  * training jobs (invisible in the declared plan) can be audited.
  * Usage: runMain graft.CvProbe [sfDir]
  */
object CvProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = GraftSession(s"local[$cpus]", cpus)
    val k = 3
    val K = Classify.NumClasses
    val foldOf = (col("lid") % k.toLong).cast(IntegerType)
    val np = s.sessionState.conf.numShufflePartitions
    val sidedAll = GraftSession.layoutCheckpoint(LrTrain.sidedLines(s, dir)
      .withColumn("fold", foldOf)
      .repartition(np, col("lid")))
    val xdbAll = GraftSession.layoutCheckpoint(LrTrain.sideXdb(sidedAll)
      .withColumn("fold", foldOf))
    println(s"[probe] sided=${sidedAll.count()} xdb=${xdbAll.count()}")
    println(s"[probe] sided partitioning: ${sidedAll.queryExecution.executedPlan.outputPartitioning}")
    println(s"[probe] xdb partitioning: ${xdbAll.queryExecution.executedPlan.outputPartitioning}")
    val tfArr = array((0 until k).map(f => lit(f)): _*)
    def toTrainFolds(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("tf", explode(tfArr))
        .filter(col("tf") =!= col("fold")).drop("fold")
    val xdb = toTrainFolds(xdbAll).hint("shuffle_merge")
    val labels = sidedAll.select("lid", "y_cls")
    val nDf = toTrainFolds(sidedAll).groupBy("tf", "side")
      .agg(count(lit(1)).as("n"))
    val nLocal = {
      val rows = nDf.collect()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), nDf.schema)
    }
    val w0p = xdb.select("tf", "side", "bucket").distinct()
      .select(Seq(col("tf"), col("side"), col("bucket")) ++
        (0 until K).map(c => lit(0L).as(s"w$c")): _*)
    val w0 = {
      val t0 = System.nanoTime()
      val rows = w0p.collect()
      println(f"[probe] w0 rows=${rows.length} in ${(System.nanoTime()-t0)/1e9}%.2f s")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), w0p.schema)
    }
    // one gdStep, inlined (gdStep is private): margins -> residuals -> gradient -> update
    val mAggs = (0 until K).map(c => sum(col("x") * col(s"w$c")).as(s"m$c"))
    val m = xdb.join(broadcast(w0), Seq("tf", "side", "bucket"))
      .groupBy(col("lid"), col("tf"), col("side"))
      .agg(mAggs.head, mAggs.tail: _*)
    def residMicros(mM: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) = {
      val p = lit(1.0) / (lit(1.0) + exp(-(mM.cast(DoubleType) / lit(1000000.0))))
      round((p - y) * lit(1000000.0)).cast(LongType)
    }
    val r = m.join(labels, Seq("lid"))
      .select(Seq(col("lid"), col("tf"), col("side")) ++ (0 until K).map(c =>
        residMicros(col(s"m$c"),
          when(col("y_cls") === c, 1.0).otherwise(0.0)).as(s"r$c")): _*)
    val gAggs = (0 until K).map(c => sum(col(s"r$c") * col("x")).as(s"g$c"))
    val g = r.join(xdb, Seq("lid", "tf", "side"))
      .groupBy(col("tf"), col("side"), col("bucket"))
      .agg(gAggs.head, gAggs.tail: _*)
    val gn = g.join(broadcast(nLocal), Seq("tf", "side"))
    val upd = w0.join(gn, Seq("tf", "side", "bucket"))
      .select(Seq(col("tf"), col("side"), col("bucket")) ++ (0 until K).map(c =>
        (col(s"w$c") - LrTrain.truncDivPos(col(s"g$c"), col("n") * lit(16L))).as(s"w$c")): _*)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = upd.collect().length
      println(f"[probe] gdStep collect pass $i: rows=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    println("==== AQE final plan ====")
    println(upd.queryExecution.executedPlan.toString.take(12000))
    s.stop()
  }
}
