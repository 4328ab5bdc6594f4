package graft

/** Dump formatted physical plans for the headline queries (plan audit). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[4]", 4)
    val dir = "/root/testdata/sf0.001"
    args.foreach { name =>
      println(s"======== $name ========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
