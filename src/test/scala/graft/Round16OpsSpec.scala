package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classify, LrTrain}

/** Round-16 dials and operators. */
class Round16OpsSpec extends GraftSpec {

  test("q151 SVC: subgradient semantics, and held-out accuracy beside q133's LR") {
    val got = LrTrain.q151SvcTrain(spark, sfDir).collect()
    assert(got.nonEmpty)
    // pure-integer loop: every weight is a multiple of nothing in
    // particular, but the matrix must be non-trivial and deterministic
    assert(got.exists(_.getLong(2) != 0L), "SVC fit must move off zero")
    val again = LrTrain.q151SvcTrain(spark, sfDir).collect()
    assert(got.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)

    // held-out accuracy, both model families on the SAME 20% slice —
    // the reference notebook's LinearSVC-beside-LogReg comparison
    def accuracyOf(wide: org.apache.spark.sql.DataFrame): Double = {
      val ev = Tables.documents(spark, sfDir).filter(!LrTrain.trainFilter)
        .select(col("doc_id"), LrTrain.labelIdx(col("text")).as("actual"),
          col("text"))
      val tok = ev.select(col("doc_id"), col("actual"),
          explode_outer(call_function("split_words", col("text"))).as("token"))
        .select(col("doc_id"), col("actual"),
          pmod(graft.functions.TextFunctions.md5Long(col("token")),
            lit(LrTrain.Buckets)).as("bucket"))
      val mAggs = (0 until Classify.NumClasses).map(c =>
        coalesce(sum(col(s"w$c")), lit(0L)).as(s"m$c"))
      val pred = tok.join(broadcast(wide), Seq("bucket"), "left_outer")
        .groupBy("doc_id", "actual").agg(mAggs.head, mAggs.tail: _*)
        .select(col("actual"),
          (-Classify.bestOfWide("m").getField("negc")).cast("int").as("pred"))
      val n = pred.count().toDouble
      pred.filter(col("actual") === col("pred")).count() / n
    }
    val lrAcc = accuracyOf(LrTrain.docWeights80Wide(spark, sfDir))
    val svcAcc = accuracyOf(LrTrain.svcWeights80Wide(spark, sfDir))
    info(f"held-out accuracy: LR=$lrAcc%.4f SVC=$svcAcc%.4f")
    // both families are prior-dominated at 3 unbalanced iterations (the
    // documented q133 limitation) — the SVC twin must land in the same
    // band as the LR it sits beside, not degenerate
    assert(svcAcc >= lrAcc - 0.05,
      f"SVC held-out accuracy $svcAcc%.4f collapsed below LR's $lrAcc%.4f")
    assert(svcAcc > 0.5)
  }

  test("coPartition=auto flips at the measured row threshold, results bit-unchanged") {
    def weights: Seq[(Int, Long, Long)] =
      LrTrain.q129LrTrain(spark, sfDir).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq

    // the decision function at the boundary
    spark.conf.set("spark.graft.lr.coPartition", "auto")
    spark.conf.set("spark.graft.lr.copartRows", "1000")
    try {
      assert(LrTrain.coPartDecided(spark, 1000L))
      assert(!LrTrain.coPartDecided(spark, 999L))
    } finally {
      spark.conf.unset("spark.graft.lr.coPartition")
      spark.conf.unset("spark.graft.lr.copartRows")
    }
    assert(!LrTrain.coPartDecided(spark, Long.MaxValue),
      "unset must never co-partition")

    val dflt = weights
    def underConf(kv: (String, String)*)(expectDecision: Boolean): Unit = {
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        LrTrain.lastCoPartDecision.set(None)
        assert(weights === dflt,
          s"weights must be bit-identical under $kv — partitioning never " +
            "touches the integer GD arithmetic")
        assert(LrTrain.lastCoPartDecision.get === Some(expectDecision),
          s"decision under $kv")
      } finally kv.foreach { case (k, _) => spark.conf.unset(k) }
    }
    // auto below threshold: baseline path taken
    underConf("spark.graft.lr.coPartition" -> "auto")(expectDecision = false)
    // auto with the threshold dialed under the corpus: co-partitioned path
    underConf("spark.graft.lr.coPartition" -> "auto",
      "spark.graft.lr.copartRows" -> "1")(expectDecision = true)
    // explicit true keeps its r14 semantics
    underConf("spark.graft.lr.coPartition" -> "true")(expectDecision = true)

    // junk values fail loudly, not silently-false
    spark.conf.set("spark.graft.lr.copartRows", "many")
    try intercept[Exception](LrTrain.CopartRows(spark))
    finally spark.conf.unset("spark.graft.lr.copartRows")
  }
}
