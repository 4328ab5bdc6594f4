package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Quantize, Similarity}

/** Partition-sizing probe for the quantization family (the
  * PostingProbe discipline, r15): the 2M/5M-vector rungs run the
  * default local profile (shuffle.partitions = cores = 32) into the
  * same granularity ceiling the posting family hit — GC-burst pass
  * spreads of 2-4x on q145/q147 and even on brute q45. This probe
  * re-measures the family at a caller-chosen partition count in ONE
  * JVM and prints per-pass lists, so the dial guidance lands beside
  * the artifact instead of in prose.
  *
  * Usage: runMain graft.PqProbe <sfDir> <partitions> [reps]
  */
object PqProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2 && args.length <= 3,
      "usage: PqProbe <sfDir> <partitions:int> [reps]")
    val dir = args(0)
    val parts =
      try args(1).toInt
      catch {
        case _: NumberFormatException =>
          sys.error(s"usage: PqProbe <sfDir> <partitions:int> [reps] — got '${args(1)}'")
      }
    val reps = if (args.length == 3) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = GraftSession(s"local[$cpus]", cpus)
    spark.conf.set("spark.sql.shuffle.partitions", parts)

    def time(name: String, f: => Long): (String, Seq[Double]) = {
      val passes = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        require(n > 0, s"$name returned no rows")
        (System.nanoTime() - t0) / 1e9
      }
      (name, passes.map(s => math.rint(s * 1000) / 1000))
    }

    val results = Seq(
      time("q45_ann_topk", Similarity.q45AnnTopk(spark, dir).count()),
      time("q145_pq_adc", Quantize.q145PqAdc(spark, dir).count()),
      time("q147_ivf_adc", Quantize.q147IvfAdc(spark, dir).count()))

    val body = results
      .map { case (n, ps) => s""""$n":[${ps.mkString(",")}]""" }
      .mkString(",")
    println(s"""{"dir":"$dir","partitions":$parts,"reps":$reps,$body}""")
    spark.stop()
  }
}
