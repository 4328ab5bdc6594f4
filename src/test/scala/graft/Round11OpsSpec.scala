package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classify, LrTrain, MlEval}

class Round11OpsSpec extends GraftSpec {

  test("q133 split is disjoint and exhaustive; no eval bucket leaks into training") {
    val d = graft.Tables.documents(spark, sfDir)
    val total = d.count()
    val nTrain = d.filter(LrTrain.trainFilter).count()
    val nEval = d.filter(!LrTrain.trainFilter).count()
    assert(nTrain + nEval == total, s"$nTrain + $nEval != $total")
    // 205/256 ≈ 80.1% expected keep rate, ±5pp at sf0.001 volumes
    assert(math.abs(nTrain.toDouble / total - 205.0 / 256.0) < 0.05,
      s"train share off: $nTrain/$total")
    // leakage check on the MODEL'S bucket space: every bucket the 80%
    // matrix knows must come from a train-slice token — an eval-only
    // bucket appearing in the matrix means eval text reached training
    val trainBuckets = LrTrain
      .docTokFrom(d.filter(LrTrain.trainFilter))
      .select("bucket").distinct()
    val leaked = LrTrain.docWeights80(spark, sfDir)
      .select("bucket").distinct()
      .join(trainBuckets, Seq("bucket"), "left_anti")
      .count()
    assert(leaked == 0, s"$leaked eval-only buckets in the 80% matrix")
    // and the held-out model is genuinely different from the full fit
    val w80 = LrTrain.docWeights80(spark, sfDir)
      .orderBy("cls", "bucket").collect().toSeq
    val wFull = LrTrain.docWeights(spark, sfDir)
      .orderBy("cls", "bucket").collect().toSeq
    assert(w80 != wFull, "80% model bit-identical to full-corpus model")
  }

  test("q133 confusion matrix is complete and internally consistent") {
    val rows = MlEval.q133HoldoutEval(spark, sfDir).collect()
    assert(rows.length == Classify.NumClasses, s"${rows.length} rows")
    val K = Classify.NumClasses
    // support = row sum of confusion cells; pred_total = column sums
    val cells = rows.map(r => (0 until K).map(c => r.getLong(1 + c)))
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i, s"actual_cls order: $r")
      val support = r.getLong(1 + K)
      val tp = r.getLong(2 + K)
      assert(cells(i).sum == support, s"row sum != support: $r")
      assert(cells(i)(i) == tp, s"diagonal != tp: $r")
      val predTotal = r.getLong(3 + K)
      assert(cells.map(_(i)).sum == predTotal, s"col sum != pred_total: $r")
      // metric quantization replays: precision = tp·1e6 / pred_total
      if (predTotal > 0)
        assert(r.getLong(4 + K) == tp * 1000000L / predTotal, r.toString)
      else assert(r.isNullAt(4 + K), r.toString)
      if (support > 0)
        assert(r.getLong(5 + K) == tp * 1000000L / support, r.toString)
    }
    // EVERY eval doc lands in exactly one cell (r12: support counts the
    // whole held-out slice like classification_report — an all-unseen
    // doc gets the zero-margin class-0 verdict instead of dropping)
    val scored = cells.map(_.sum).sum
    val evalDocs = graft.Tables.documents(spark, sfDir)
      .filter(!LrTrain.trainFilter).count()
    assert(scored == evalDocs, s"scored $scored of $evalDocs eval docs")
  }

  test("q134 probabilities are calibrated: sum to 1e6 minus truncation, argmax = q28 verdict") {
    val rows = MlEval.q134PredictProba(spark, sfDir).collect()
    val K = Classify.NumClasses
    assert(rows.length % K == 0 && rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      assert(rs.length == K, s"doc $doc has ${rs.length} class rows")
      val probs = rs.sortBy(_.getInt(1)).map(r => r.getLong(3))
      val tot = probs.sum
      // truncating normalization loses < 1 micro per class
      assert(tot <= 1000000L && tot > 1000000L - K, s"doc $doc prob sum $tot")
      // argmax(prob) agrees with the exact-margin verdict (ties to
      // lowest class on both sides)
      val pred = rs.head.getInt(4)
      val maxP = probs.max
      assert(probs(pred) == maxP,
        s"doc $doc pred_class $pred has prob ${probs(pred)} < max $maxP")
      assert(probs.indexWhere(_ == maxP) <= pred, s"doc $doc tie-break at $pred")
    }
    // the verdict column IS q28's verdict, doc for doc
    val q28 = Classify.q28ClassifyLr(spark, sfDir)
      .select(col("doc_id"), col("pred_class").as("q28_pred"))
    val mismatch = MlEval.q134PredictProba(spark, sfDir)
      .select("doc_id", "pred_class").distinct()
      .join(q28, Seq("doc_id"))
      .filter(col("pred_class") =!= col("q28_pred")).count()
    assert(mismatch == 0, s"$mismatch docs diverge from q28")
  }

  test("lr hyperparameter dials keep Spark and the oracle twin in lockstep") {
    // the twin SQL is GENERATED through the same conf accessors the
    // plans read, so a dialed session's oracle unrolls exactly the
    // configured iteration count
    try {
      spark.conf.set("spark.graft.lr.iters", "2")
      assert(LrTrain.Iters == 2)
      val sql = LrTrain.q129Sql
      assert(sql.contains("FROM w2 ") && !sql.contains("w3"),
        "q129Sql must unroll exactly the configured iterations")
      assert(LrTrain.docWeightPath(spark, sfDir).length == 3) // w0..w2
    } finally spark.conf.unset("spark.graft.lr.iters")
    assert(LrTrain.Iters == 3 && LrTrain.LrDen == 16L, "defaults restored")
    // the exact-division primitive truncates toward zero like DuckDB's
    // `//` (-7 div 2 = -3, NOT floor's -4) — every quantized update in
    // the LR family leans on this
    val d = spark.range(1).select(
      graft.operators.LrTrain.truncDivPos(lit(-7L), lit(2L))).head.getLong(0)
    assert(d == -3L, s"div semantics drifted: -7 div 2 = $d")
  }

  test("q109 dial auto-sizes in-lineage to the r10 held-occupancy table") {
    import graft.operators.Dedup
    // BENCH_R10_SF1.json q109_held_occupancy held these bits per corpus
    // (bands=4, occupancy ≈ 60-80): the derivation must reproduce them
    // so default conf now IS the tuned soak configuration
    assert(Dedup.rpDerivedBitsFor(2000) == 5)
    assert(Dedup.rpDerivedBitsFor(20000) == 8)
    assert(Dedup.rpDerivedBitsFor(60000) == 10)
    assert(Dedup.rpDerivedBitsFor(20) == 1, "floor clamp")
    assert(Dedup.rpDerivedBitsFor(Long.MaxValue) == Dedup.RpMaxBits, "cap")
    // exact powers of the threshold stay deterministic (the reason the
    // derivation is integer comparisons, not a float log2 both engines
    // could ceil differently)
    assert(Dedup.rpDerivedBitsFor(Dedup.RpTargetOcc * 1024) == 10)
    assert(Dedup.rpDerivedBitsFor(Dedup.RpTargetOcc * 1024 + 1) == 11)
    // the count is in-lineage: building the q109 plan launches no jobs
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Dedup.q109EmbedLsh(spark, sfDir).queryExecution.optimizedPlan.toString
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, s"plan build ran ${after - before} jobs")
  }

  test("q135 balanced fit beats the majority-class prior; plain fit never does") {
    val d = graft.Tables.documents(spark, sfDir)
    val labels = d.select(col("doc_id"), LrTrain.labelIdx(col("text")).as("y"))
    val nDocs = labels.count()
    val prior = labels.groupBy("y").count()
      .agg(max("count")).head.getLong(0).toDouble / nDocs
    def accuracyOf(w: org.apache.spark.sql.DataFrame): Double =
      LrTrain.docTok(spark, sfDir)
        .join(broadcast(w), Seq("bucket"))
        .groupBy("doc_id", "cls").agg(sum("w_micros").as("m"))
        .groupBy("doc_id")
        .agg(max(struct(col("m"), -col("cls"))).as("b"))
        .select(col("doc_id"), (-col("b").getField("col2")).as("pred"))
        .join(labels, Seq("doc_id"))
        .agg(avg(when(col("pred") === col("y"), 1.0).otherwise(0.0)))
        .head.getDouble(0)
    // the DOCUMENTED iteration count where the balanced argmax beats
    // the prior: 12 (measured: balanced 0.856 / 0.894 at 12 / 20 iters
    // vs plain pinned at the 0.792 prior even at 20 — the sample
    // weighting changes what GD learns, not just how fast). The
    // registry default stays 3 so every oracle row replays unchanged;
    // a production fit dials spark.graft.lr.iters exactly like this.
    try {
      spark.conf.set("spark.graft.lr.iters", "12")
      // through the REGISTRY accessor: exercises the dial-keyed cache
      // (a 12-iteration session must train fresh, not reuse the
      // default fit) alongside the accuracy claim
      val balanced = accuracyOf(LrTrain.docWeightsBalanced(spark, sfDir))
      val plain = accuracyOf(LrTrain.trainedDocWeights(spark, sfDir))
      assert(plain <= prior + 0.01, s"plain $plain vs prior $prior")
      assert(balanced > prior + 0.05,
        s"balanced $balanced does not beat prior $prior")
    } finally spark.conf.unset("spark.graft.lr.iters")
  }

  test("k-fold CV partitions the corpus; per-fold sided accuracy and grid search hold") {
    val cv = MlEval.sidedCrossVal(spark, sfDir, 3).collect()
    assert(cv.length == 6, s"expected 2 sides × 3 folds, got ${cv.length}")
    assert(cv.map(r => (r.getString(0), r.getInt(1))).toSet ==
      (for (s <- Seq("assets", "liabilities"); f <- 0 until 3) yield (s, f)).toSet)
    // r12: integer metrics (n_correct, acc in truncated micros) so the
    // sweep is oracle-replayable as q138
    cv.foreach { r =>
      assert(r.getLong(4) > 900000L, s"fold accuracy collapsed: $r")
      assert(r.getLong(4) == r.getLong(3) * 1000000L / r.getLong(2),
        s"acc_micros is not the truncated count ratio: $r")
    }
    // folds are disjoint + exhaustive: scored lines sum to the distinct
    // line universe (scoring groups physical dup rows by lid)
    val scored = cv.map(_.getLong(2)).sum
    val universe = LrTrain.sidedLines(spark, sfDir)
      .select("lid").distinct().count()
    assert(scored == universe, s"$scored scored vs $universe lines")
    // GridSearchCV's shape: one mean-accuracy summary per dial point;
    // conf restored afterwards
    val grid = MlEval.sidedGridSearch(spark, sfDir, Seq(16, 64), 2)
    assert(grid.map(_._1) == Seq(16, 64))
    grid.foreach { case (den, a) =>
      assert(a > 0.8 && a <= 1.0, s"den=$den mean acc $a") }
    assert(spark.conf.getOption("spark.graft.lr.lrDen").isEmpty)
  }

  test("rp_lsh_keys native signature matches an independent fold bit for bit") {
    import graft.operators.Dedup
    val s = spark
    try {
      // a HIGH dial (the oracle gate only exercises the small derived
      // bits): every bit of every band must match a driver-side
      // reimplementation of the published formula on the same floats
      s.conf.set("spark.graft.rplsh.bandBits", "12")
      val got = Dedup.q109EmbedLsh(spark, sfDir) // sanity: plan executes
      got.collect()
      val rows = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"),
          call_function("rp_lsh_keys", col("embedding"), lit(12),
            lit(Dedup.RpBands), lit(Dedup.RpMaxBits)).as("keys"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val e = r.getSeq[Float](1)
        val keys = r.getSeq[Int](2)
        val want = (0 until Dedup.RpBands).map { b =>
          (0 until 12).foldLeft(0) { (key, i) =>
            val seed = (b * Dedup.RpMaxBits + i).toLong * 1000003L
            var acc = 0.0
            var d = 1
            while (d <= e.length) {
              val lcg = (1103515245L * (seed + d) + 12345L) % 2147483648L
              acc += e(d - 1).toDouble * (lcg.toDouble / 2147483648.0 - 0.5)
              d += 1
            }
            (key << 1) | (if (acc >= 0.0) 1 else 0)
          }
        }
        assert(keys == want, s"vec ${r.getLong(0)}: $keys vs $want")
      }
    } finally s.conf.unset("spark.graft.rplsh.bandBits")
  }

  test("q136 side-routed probabilities: sums calibrated, argmax = q104 verdict") {
    val rows = MlEval.q136SideProba(spark, sfDir).collect()
    val K = Classify.NumClasses
    assert(rows.length % K == 0 && rows.nonEmpty)
    val byLine = rows.groupBy(r => (r.get(0), r.get(1), r.get(2), r.get(3)))
    byLine.foreach { case (line, rs) =>
      assert(rs.length == K, s"$line has ${rs.length} class rows")
      val probs = rs.sortBy(_.getInt(5)).map(_.getLong(7))
      val tot = probs.sum
      assert(tot <= 1000000L && tot > 1000000L - K, s"$line prob sum $tot")
      val pred = rs.head.getInt(8)
      assert(probs(pred) == probs.max, s"$line argmax")
    }
    // the verdict column IS q104's verdict, line for line
    val q104 = Classify.q104DualLr(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("pred_class").as("q104_pred"))
    val mismatch = MlEval.q136SideProba(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "pred_class")
      .distinct()
      .join(q104, Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"))
      .filter(col("pred_class") =!= col("q104_pred")).count()
    assert(mismatch == 0, s"$mismatch lines diverge from q104")
  }

  test("model registry cold-start: a wide accessor as first caller trains cleanly") {
    // regression: the memoized wide pivot trains its long artifact
    // inside its own cache-insert thunk; with computeIfAbsent that
    // nested insert threw ConcurrentHashMap's "Recursive update"
    // whenever the two keys shared a bin (bin-layout luck — it passed
    // verify and failed the bench JVM). Drive the exact cold path.
    LrTrain.clearModelCache()
    assert(LrTrain.sideWeightsWide(spark, sfDir).count() > 0)
    LrTrain.clearModelCache()
    assert(LrTrain.docWeightsWide(spark, sfDir).count() > 0)
    assert(LrTrain.docWeights(spark, sfDir).count() > 0) // long form reuses
  }

  test("sided models generalize: held-out argmax accuracy stays >95% per side") {
    // the in-sample claim from round 10, now proven on lines the
    // training never saw (80/20 lid-hash split)
    val acc = MlEval.sidedHoldoutAccuracy(spark, sfDir)
    assert(acc.keySet == Set("assets", "liabilities"), acc.toString)
    acc.foreach { case (side, a) =>
      assert(a > 0.95, s"held-out $side accuracy $a")
    }
  }
}
