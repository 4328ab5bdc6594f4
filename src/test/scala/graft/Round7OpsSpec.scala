package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-7 guards: the cluster-label naming operator (q108) and the
  * native cleaner expressions' plan hygiene.
  */
class Round7OpsSpec extends GraftSpec {

  test("q108 cluster labels: one top-TF-IDF term per q105 cluster, from the vocab") {
    val labels = Similarity.q108ClusterLabels(spark, sfDir).collect()
    val clusters = Similarity.q105TfidfKmeans(spark, sfDir)
      .select("cid").collect().map(_.getInt(0)).toSet
    // exactly one label row per cluster the clustering produced
    assert(labels.map(_.getInt(0)).toSet == clusters, labels.mkString(", "))
    assert(labels.length == clusters.size)
    // every label term comes from the bounded top-V vocabulary, and the
    // scores/doc-counts are positive (a 1-topic LDA surfaces a word that
    // actually occurs in the cluster)
    val vocab = Similarity.tfidfWeights(spark, sfDir)
      .select("token").distinct().collect().map(_.getString(0)).toSet
    labels.foreach { r =>
      assert(vocab.contains(r.getString(1)), s"label term not in vocab: $r")
      assert(r.getDouble(2) > 0.0, s"non-positive score: $r")
      assert(r.getLong(3) > 0L, s"non-positive doc count: $r")
    }
  }

  test("q108 label is the argmax: no other term in the cluster scores higher") {
    val assigned = Similarity.tfidfAssignments(spark, sfDir)
      .select(col("doc_id"), col("cid"))
    val scores = Similarity.tfidfWeights(spark, sfDir)
      .join(assigned, Seq("doc_id"))
      .groupBy("cid", "token")
      .agg(sum(col("w")).as("score"))
      .collect()
      .groupBy(_.getInt(0))
    val labels = Similarity.q108ClusterLabels(spark, sfDir).collect()
    labels.foreach { r =>
      val cid = r.getInt(0)
      val best = scores(cid).maxBy(_.getDouble(2))
      // double-sum check is approximate (the operator ranks on exact
      // decimal sums); equality within an ulp-scale tolerance plus the
      // tiebreak term must agree
      assert(math.abs(best.getDouble(2) - r.getDouble(2)) < 1e-6,
        s"cluster $cid: label score ${r.getDouble(2)} vs max ${best.getDouble(2)}")
    }
  }

  test("observe() metrics ride the curation pass and match recomputed tallies") {
    import graft.operators.Curation
    val obs = new org.apache.spark.sql.Observation("curation_stats")
    val out = Curation.observedCuration(spark, sfDir, obs)
    val rows = out.collect() // one action drives both output and metrics
    val m = obs.get
    assert(m("docs_total") == rows.length.toLong, m)
    assert(m("docs_kept") == rows.count(_.getBoolean(1)).toLong, m)
    assert(m("docs_dropped") == rows.count(!_.getBoolean(1)).toLong, m)
    val keptQ = rows.filter(_.getBoolean(1)).map(_.getDouble(3))
    assert(math.abs(m("kept_mean_quality").asInstanceOf[Double] -
      keptQ.sum / keptQ.length) < 1e-9, m)
  }

  test("native cleaner expressions keep every clean-chain plan compact") {
    // the round-6 failure mode: inlined Column chains for messy/clean
    // blew Janino's 64 KB method limit and silently lost whole-stage
    // codegen. The native expressions print as single calls — assert no
    // query's plan carries a mega-line regex chain anymore.
    import graft.operators.{BalanceSheet, Edgar}
    Seq(
      Edgar.q22CleanNumeric(spark, sfDir),
      Edgar.q23MergeColumns(spark, sfDir),
      BalanceSheet.q103Impl(spark, sfDir, checkpoint = false)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("clean_numeric"), "native cleaner missing from plan")
      plan.linesIterator.foreach { l =>
        assert("regexp_replace".r.findAllIn(l).size < 10,
          s"inlined regex chain reappeared: ${l.take(200)}")
      }
    }
  }
}
