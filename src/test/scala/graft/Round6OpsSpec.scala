package graft

import org.apache.spark.sql.functions._

import graft.operators.{BalanceSheet, Classify, Extended, Relational, Similarity}

/** Round-6 guards and compositions: the q96 walk's cycle guard, plus
  * invariants for the round's new operators (added below as they land).
  */
class Round6OpsSpec extends GraftSpec {

  test("q96 hierarchy walk fails loudly on cyclic edges instead of looping") {
    import spark.implicits._
    // 100 -> 200 -> 100: a 2-cycle that never reaches a root (< 10)
    val nodes = Seq(100L, 200L).toDF("k")
    val edges = Seq((100L, 200L), (200L, 100L)).toDF("child", "parent")
    val ex = intercept[IllegalStateException] {
      Extended.hierarchyWalk(nodes, edges).collect()
    }
    assert(ex.getMessage.contains("not drained"), ex.getMessage)
  }

  test("q96 hierarchy walk still resolves an acyclic forest through the shared core") {
    import spark.implicits._
    val nodes = Seq(5L, 42L, 421L).toDF("k")
    val edges = Seq((42L, 4L), (421L, 42L)).toDF("child", "parent")
    val rows = Extended.hierarchyWalk(nodes, edges).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((5L, 5L, 0L), (42L, 4L, 1L), (421L, 4L, 2L)), got.toString)
  }

  test("q103 back-half capstone composes every stage with the synthesized invariants") {
    val rows = BalanceSheet.q103BackHalf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every (sheet, block) appears once; blocks are only the two real ones
    val keys = rows.map(r => (r.getLong(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
    assert(rows.map(_.getString(1)).toSet == Set("assets", "liabilities"))
    // totals_check stripped the synthetic total rows: they never win top_class
    assert(!rows.exists(_.getString(6) == "__total__"))
    // manual override fired (nation-derived labels) alongside rule labels
    val classes = rows.map(_.getString(6)).toSet
    assert(classes.exists(_.startsWith("manual_")), classes.toString)
    assert(classes.exists(_.endsWith("_related")), classes.toString)
    // the key%7 distortion drives the full grade lattice
    val byGrade = rows.groupBy(_.getString(11)).map { case (g, rs) => g -> rs.length }
    assert(Set("PERFECT", "BOUNDED", "GROSS", "NOT FOUND").subsetOf(byGrade.keySet), byGrade.toString)
    rows.foreach { r =>
      val (okey, grade) = (r.getLong(0), r.getString(11))
      val relErr = if (r.isNullAt(10)) None else Some(r.getDouble(10))
      okey % 7 match {
        case 0 => assert(grade == "NOT FOUND" && r.isNullAt(8), r.toString)
        case 1 | 2 | 3 => // exact total → PERFECT unless the block sum is 0
          // (all '-' OCR variants), where rel_err is undefined → GROSS
          assert((grade == "PERFECT" && relErr.contains(0.0)) ||
            (grade == "GROSS" && relErr.isEmpty), r.toString)
        case 4 | 5 => // ×1.04 → |1 - 1/1.04| ≈ 0.038462 unless the block sum is 0
          assert(grade == "BOUNDED" || (grade == "GROSS" && relErr.isEmpty), r.toString)
        case _ => assert(grade == "GROSS", r.toString)
      }
      // reconstruction is the sum of kept (non-total) lines: PERFECT rows
      // must reproduce the reported total exactly
      if (grade == "PERFECT") assert(r.getDouble(8) == r.getDouble(9), r.toString)
    }
    // column_purge: sheets with l_partkey%13==0 rows report them
    assert(rows.exists(_.getLong(5) > 0))
  }

  test("q104 routes each line to its side's weight matrix (dual-model parity)") {
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)) ->
          (r.getString(4), r.getInt(5), r.getDouble(6))
      }.toMap
    val routed = keyed(Classify.q104DualLr(spark, sfDir))
    val forcedA = keyed(Classify.routedLr(spark, sfDir, Some("assets")))
    val forcedL = keyed(Classify.routedLr(spark, sfDir, Some("liabilities")))
    assert(routed.nonEmpty)
    val sides = routed.values.map(_._1).toSet
    assert(sides == Set("assets", "liabilities"), sides.toString)
    // routing parity: a line scored by the routed run matches the
    // force-sided run for its own side, score and argmax alike
    routed.foreach { case (k, (side, pred, score)) =>
      val forced = if (side == "assets") forcedA(k) else forcedL(k)
      assert((pred, score) == (forced._2, forced._3), s"$k: $side routed ($pred,$score) vs $forced")
    }
    // the two matrices are genuinely different models (round 10: both
    // are TRAINED on their own side's lines, so they converge to similar
    // argmaxes — distinctness shows in the margins, not the labels):
    // some line scores differently under the asset vs liability matrix
    assert(routed.keys.exists(k => forcedA(k)._3 != forcedL(k)._3))
  }

  test("q105 clusters TF-IDF features: partition of the vocab-bearing corpus") {
    import org.apache.spark.sql.functions._
    val rows = Similarity.q105TfidfKmeans(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= Similarity.TkK)
    // cluster sizes partition exactly the docs that carry >=1 vocab token
    val d = Tables.documents(spark, sfDir)
    val tf = d.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("doc_id", "token").count()
    val vocab = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), asc("token")).limit(Similarity.TkVocab)
    val nCorpus = tf.join(vocab, Seq("token")).select("doc_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCorpus)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) >= -1e-9, s"mean d2 must be ~nonnegative: $r")
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("q103's clean chain stays above a pinned exchange, not in the scan stage") {
    // Regression guard for the round-6 finding: Catalyst pushes the
    // CPU-heavy clean projection into the scan stage, whose
    // parallelism is the parquet split count — one small file would
    // serialize ~45M clean calls on one core. The fix hangs the chain
    // above an explicit-count (non-AQE-coalescible) repartition; this
    // asserts the shape so a refactor can't silently undo it. The
    // heavy markers are the native messy_numeric/clean_numeric calls
    // (round 7 — previously the inlined ~76-regex Column chain, which
    // blew Janino's 64 KB limit and lost whole-stage codegen). The
    // checkpoint=false variant is inspected because the production
    // checkpoint truncates the returned plan at the stage-4 barrier —
    // the chain's shape is only visible in the un-checkpointed lineage.
    val plan = BalanceSheet.q103Impl(spark, sfDir, checkpoint = false)
      .queryExecution.executedPlan.toString.linesIterator.toVector
    val heavy = plan.zipWithIndex.filter { case (l, _) =>
      l.contains("messy_numeric") || l.contains("clean_numeric") }
    assert(heavy.nonEmpty, "clean chain projection not found in plan")
    heavy.foreach { case (_, i) =>
      // children print BELOW parents: between the heavy projection and
      // its leaf scan there must be the pinned repartition exchange.
      // An EMPTY `below` means the heavy line sits DIRECTLY on top of a
      // FileScan — the exact pushed-into-the-scan-stage shape this test
      // exists to catch — so it must fail, not pass vacuously (r7
      // advice: the old `below.isEmpty ||` escape defeated the guard).
      val below = plan.drop(i + 1).takeWhile(!_.contains("FileScan"))
      assert(below.exists(_.contains("REPARTITION_BY_NUM")),
        s"heavy projection at line $i is not above a pinned repartition:\n" +
          plan.slice(i, i + 6).mkString("\n"))
    }
    // and the old failure mode stays dead: no projection line carries an
    // inlined regex chain big enough to threaten the 64 KB codegen limit
    assert(!plan.exists(l => "regexp_replace".r.findAllIn(l).size >= 10),
      "an inlined regex chain reappeared in the q103 plan")
  }

  test("q107 session_window sessions are gap-consistent and event-conserving") {
    import org.apache.spark.sql.functions._
    val rows = Relational.q107SessionWindow(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val gapMs = 30L * 60 * 1000
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sessions = rs.sortBy(_.getTimestamp(1).getTime)
      sessions.foreach { r =>
        assert(r.getTimestamp(1).getTime <= r.getTimestamp(2).getTime)
      }
      // consecutive sessions of one user are separated by >= the gap
      sessions.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getTimestamp(1).getTime >= a.getTimestamp(2).getTime + gapMs,
            s"sessions closer than gap: $a | $b")
        case _ =>
      }
    }
    // every event lands in exactly one session
    val totalEvents = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getLong(3)).sum == totalEvents)
  }

  test("q107's session_window expression works identically under readStream") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val events = Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:10:00", 2.0), // same session (gap 10m)
      (1L, "2024-01-01 00:40:00", 3.0), // exactly 30m after: MERGES (> rule)
      (2L, "2024-01-01 00:00:00", 4.0)
    ).map { case (u, t, v) => (u, Timestamp.valueOf(t), v) }
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val input = stream.toDF().toDF("user_id", "ts", "value")
    val query = input
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("v"))
      .select(col("user_id"), col("session_window.start").as("s"),
        col("n_events"), col("v"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      stream.addData(events)
      // advance the watermark past all sessions so they close and emit
      stream.addData(Seq((9L, Timestamp.valueOf("2024-01-01 09:00:00"), 0.0)))
      query.processAllAvailable()
      val got = sp.sql("SELECT user_id, s, n_events, v FROM sess_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
        .toSet
      val want = Set(
        // exactly-gap event merges: all three user-1 events are ONE
        // session — the `>`-starts-new boundary rule the batch oracle uses
        (1L, "2024-01-01 00:00:00.0", 3L, 6.0),
        (2L, "2024-01-01 00:00:00.0", 1L, 4.0))
      assert(want.subsetOf(got), s"got $got")
    } finally query.stop()
  }

  test("q106 sketch percentiles honor the Greenwald-Khanna rank-error bound") {
    val rows = Relational.q106ApproxPercentile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byGroup = Tables.orders(spark, sfDir)
      .select("o_orderpriority", "o_totalprice").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    rows.foreach { r =>
      val (grp, n) = (r.getString(0), r.getLong(1))
      val vals = byGroup(grp)
      assert(n == vals.length.toLong)
      // sketch result must be an actual element whose rank is within
      // n/accuracy of the target rank (GK guarantee); exact columns match
      // a direct interpolation-free rank check loosely (p is exact q14)
      for ((q, sketchIdx) <- Seq((0.5, 4), (0.9, 5))) {
        val v = r.getDouble(sketchIdx)
        val rankLo = vals.count(_ < v)
        val rankHi = vals.count(_ <= v)
        val target = q * n
        val dist = if (target < rankLo) rankLo - target
                   else if (target > rankHi) target - rankHi
                   else 0.0
        val bound = n.toDouble / Relational.SketchAccuracy + 1
        assert(dist <= bound, s"$grp q=$q: rank dist $dist > bound $bound (v=$v, n=$n)")
      }
    }
  }
}
