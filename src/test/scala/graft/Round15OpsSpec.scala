package graft

import org.apache.spark.sql.functions._

import graft.operators.LrTrain

/** Round-15 operator hardening. */
class Round15OpsSpec extends GraftSpec {

  test("the coPartition dial changes the plan, never the model") {
    val base = LrTrain.q129LrTrain(spark, sfDir).collect().toSeq
    spark.conf.set("spark.graft.lr.coPartition", "true")
    try {
      val copart = LrTrain.q129LrTrain(spark, sfDir).collect().toSeq
      assert(copart == base, "co-partitioned training changed the weights")
      val balBase = {
        spark.conf.unset("spark.graft.lr.coPartition")
        LrTrain.q135LrBalanced(spark, sfDir).collect().toSeq
      }
      spark.conf.set("spark.graft.lr.coPartition", "true")
      val balCopart = LrTrain.q135LrBalanced(spark, sfDir).collect().toSeq
      assert(balCopart == balBase, "co-partitioned balanced training changed the weights")
    } finally spark.conf.unset("spark.graft.lr.coPartition")
  }

  test("coPartition dial rejects malformed values loudly") {
    spark.conf.set("spark.graft.lr.coPartition", "yes please")
    try intercept[Exception] {
      LrTrain.q129LrTrain(spark, sfDir).collect()
    } finally spark.conf.unset("spark.graft.lr.coPartition")
  }
}
