package graft

import org.apache.spark.sql.functions._

/** Scratch probe: under which conditions does localCheckpoint preserve
  * outputPartitioning in this Spark build? Usage: runMain graft.CkptProbe
  */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val s = GraftSession("local[8]", 8)
    def show(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val ck = df.localCheckpoint()
      println(s"[ckpt] $tag -> ${ck.queryExecution.executedPlan.outputPartitioning}")
      // and what a consumer sees: group by the key, look for Exchange
      val agg = ck.groupBy("k").count()
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      println(s"[ckpt] $tag consumer exchanges=$nEx")
    }
    val base = s.range(0, 1000000).select((col("id") % 1000).as("k"), col("id").as("v"))
    show("aqe-on ", base.repartition(8, col("k")))
    s.conf.set("spark.sql.adaptive.enabled", "false")
    show("aqe-off", base.repartition(8, col("k")))
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.stop()
  }
}
