package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, TextOps}

/** Round-8 guards: perplexity bucketing (q110), duplicated-span
  * detection (q111), and entropy/TTR diagnostics (q112). Each operator
  * is oracle-checked by the driver gate; these specs verify the
  * SEMANTIC claims the oracle can't express — bucket balance, that a
  * reported span really is a common substring of the two documents,
  * and the information-theoretic bounds on entropy.
  */
class Round8OpsSpec extends GraftSpec {

  test("q110 buckets each language into near-equal thirds, ppl >= 1") {
    val rows = TextOps.q110DocPerplexity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) > 0, s"n_bigrams must be positive: $r")
      assert(r.getLong(3) >= 0, s"nll_micro must be >= 0 (p <= 1): $r")
      assert(r.getDouble(4) >= 1.0, s"perplexity must be >= 1: $r")
      assert(r.getLong(5) >= 1 && r.getLong(5) <= 3, s"bucket out of range: $r")
    }
    // NTILE(3) balance: per language, bucket sizes differ by at most 1
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_.getLong(5)).view.mapValues(_.length).values
      assert(sizes.max - sizes.min <= 1, s"unbalanced buckets for $lang")
    }
    // bucket order tracks mean NLL: within a language every bucket-1 doc
    // scores <= every bucket-3 doc
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      def mean(r: org.apache.spark.sql.Row) = r.getLong(3).toDouble / r.getLong(2)
      val b1 = rs.filter(_.getLong(5) == 1).map(mean)
      val b3 = rs.filter(_.getLong(5) == 3).map(mean)
      if (b1.nonEmpty && b3.nonEmpty)
        assert(b1.max <= b3.min + 1e-12, s"bucket order violated for $lang")
    }
    // every doc with >= 2 tokens is scored (the LM drops nothing)
    val expected = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.length.toLong == expected)
  }

  test("q111 reported spans are real: the two texts share a contiguous run") {
    val rows = Dedup.q111DupSpans(spark, sfDir).collect()
    assert(rows.nonEmpty, "span detector found nothing at sf0.001")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), s"pair not ordered: $r")
      assert(r.getLong(3) >= Dedup.SpanMin, s"span below threshold: $r")
      assert(r.getLong(4) >= r.getLong(3), s"sum < max: $r")
    }
    // independent verification, no hashing involved: for the pair with
    // the longest reported span, brute-force the longest common
    // contiguous token run between the two raw texts — it must be at
    // least the reported span (equality can be broken only by the
    // posting-list cap dropping a shingle)
    val top = rows.maxBy(_.getLong(3))
    val texts = Tables.documents(spark, sfDir)
      .filter(col("doc_id").isin(top.getLong(0), top.getLong(1)))
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val (a, b) = (texts(top.getLong(0)), texts(top.getLong(1)))
    var best = 0
    for (i <- a.indices; j <- b.indices if a(i) == b(j)) {
      var k = 0
      while (i + k < a.length && j + k < b.length && a(i + k) == b(j + k)) k += 1
      best = best max k
    }
    assert(best >= top.getLong(3),
      s"reported span ${top.getLong(3)} but longest real common run is $best")
  }

  test("q111 plan stays keyed: no cartesian or nested-loop join") {
    val plan = Dedup.q111DupSpans(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian product in span plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ in span plan")
  }

  test("q112 entropy respects its information-theoretic bounds") {
    val rows = TextOps.q112EntropyStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nTyp) = (r.getLong(1), r.getLong(2))
      assert(nTyp >= 1 && nTyp <= nTok, s"types out of range: $r")
      assert(r.getDouble(3) == BigDecimal(nTyp.toDouble / nTok)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"ttr wrong: $r")
      val ent = r.getDouble(5)
      // 0 <= H <= ln(n_types), with slack for the micro-nat quantization
      assert(ent >= -1e-6, s"negative entropy: $r")
      assert(ent <= math.log(nTyp.toDouble) + 1e-6, s"entropy above ln(types): $r")
      // single-type docs have exactly zero entropy
      if (nTyp == 1) assert(r.getLong(4) == 0L, s"one type but H != 0: $r")
    }
    // direct recomputation for the widest doc (most types): the quantized
    // figure must agree with a plain double-precision evaluation
    val top = rows.maxBy(_.getLong(2))
    val toks = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === top.getLong(0))
      .collect().head.getString(1).split(" ").filter(_.nonEmpty)
    val n = toks.length.toDouble
    val direct = toks.groupBy(identity).values
      .map(g => g.length / n * math.log(n / g.length)).sum
    assert(math.abs(direct - top.getDouble(5)) < 1e-4,
      s"entropy mismatch: direct $direct vs ${top.getDouble(5)}")
  }

  test("q113 fills each stratum budget greedily, overshoot <= one doc") {
    val rows = Curation.q113BudgetSample(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // kept docs never start past the budget; overshoot is bounded by the
    // last doc (cum < budget + n_tokens by construction)
    rows.foreach { r =>
      assert(r.getLong(4) - r.getLong(3) < r.getLong(5), s"doc starts past budget: $r")
    }
    // per stratum: either the budget is filled (max cum >= budget) or
    // the whole stratum was kept (budget exceeds the stratum's tokens)
    val stratumSizes = Tables.documents(spark, sfDir)
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.groupBy(r => (r.getString(1), r.getString(2))).foreach { case (key, rs) =>
      val filled = rs.map(_.getLong(4)).max >= rs.head.getLong(5)
      assert(filled || rs.length.toLong == stratumSizes(key),
        s"stratum $key neither filled its budget nor kept every doc")
    }
    // deterministic: the sample is a pure function of the data
    val again = Curation.q113BudgetSample(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // the total budget is the configured fraction of corpus tokens,
    // up to one floor() per stratum
    val totalTokens = Tables.documents(spark, sfDir)
      .select(sum(size(split(col("text"), " ")).cast("long"))).collect().head.getLong(0)
    val budgets = rows.groupBy(r => (r.getString(1), r.getString(2)))
      .map(_._2.head.getLong(5)).sum
    assert(budgets <= (Curation.BudgetFrac * totalTokens).toLong + 1,
      s"budgets $budgets exceed the ${Curation.BudgetFrac} fraction of $totalTokens")
  }

  test("q114 DSIR selection enriches the target language and is deterministic") {
    val rows = Curation.q114DsirSelect(spark, sfDir).collect()
    assert(rows.length == Curation.DsirTopK)
    // scores arrive ranked, ties broken by doc_id
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (sa, sb) = (a.getLong(4), b.getLong(4))
        assert(sa > sb || (sa == sb && a.getLong(0) < b.getLong(0)),
          s"ranking out of order: $a then $b")
      case _ =>
    }
    // the whole point of importance resampling: the target slice
    // (lang = 'en') is ENRICHED relative to its corpus base rate, and
    // is the plurality class of the selection (the synthetic corpus
    // shares most vocabulary across languages, so the margin is small
    // but the direction must hold)
    val langCounts = rows.groupBy(_.getString(1)).view.mapValues(_.length)
    val enTop = langCounts.getOrElse("en", 0)
    assert(langCounts.forall { case (l, c) => l == "en" || c < enTop },
      s"target language is not the plurality of the selection: $langCounts")
    val d = Tables.documents(spark, sfDir)
    val baseRate = d.filter(col("lang") === "en").count().toDouble / d.count()
    assert(enTop.toDouble / rows.length >= baseRate,
      s"no enrichment: ${enTop.toDouble / rows.length} vs base $baseRate")
    // pure function of the data
    val again = Curation.q114DsirSelect(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q115 portable HLL: bounded error, duplication-insensitive, mergeable") {
    import graft.operators.Relational
    val rows = Relational.q115PortableHll(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 64, s"occupied out of range: $r")
      assert(r.getDouble(3) > 0, s"non-positive estimate: $r")
      // m=64 gives sigma ~ 1.04/8 = 13%; 3-sigma bound on fixed data
      assert(r.getDouble(4) < 0.4, s"estimate error too large: $r")
    }
    // the sketch is a function of the SET of values: feeding every value
    // twice must not move the estimate at all
    val l = Tables.lineitem(spark, sfDir)
    val vals = l.select(lit("k").as("c"),
      col("l_orderkey").cast("string").as("v"))
    val once = Relational.hllEstimate(vals).collect().head
    val twice = Relational.hllEstimate(vals.union(vals)).collect().head
    assert(once.getDouble(2) == twice.getDouble(2),
      s"duplication moved the estimate: $once vs $twice")
    // merge law: registers of a union = max of registers — the sketch of
    // two disjoint halves concatenated equals the sketch of the whole
    // (which is exactly how 1000 executors would combine their registers)
    val whole = Relational.hllEstimate(vals).collect().head.getDouble(2)
    val halves = vals.filter(col("v").cast("long") % 2 === 0)
      .union(vals.filter(col("v").cast("long") % 2 === 1))
    val merged = Relational.hllEstimate(halves).collect().head.getDouble(2)
    assert(whole == merged, s"merge law violated: $whole vs $merged")
  }

  test("q117 incremental probe agrees with the full q42 pairing") {
    val probe = Dedup.q117LshProbe(spark, sfDir).collect()
    assert(probe.nonEmpty, "no cross-split near-dups at sf0.001")
    probe.foreach { r =>
      assert(r.getLong(0) % 5 == 0, s"probe side not from the new batch: $r")
      assert(r.getLong(1) % 5 != 0, s"index side from the new batch: $r")
      assert(r.getDouble(2) >= 0.5, s"below the jaccard gate: $r")
    }
    // cross-validation: every incremental match must be exactly the
    // corresponding pair of the full corpus-wide q42 run, same estimate
    val full = Dedup.q42MinhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    probe.foreach { r =>
      val key = (r.getLong(0) min r.getLong(1), r.getLong(0) max r.getLong(1))
      assert(full.get(key).contains(r.getDouble(2)),
        s"incremental match $r not in (or differs from) the full pairing")
    }
    // and completeness within its scope: every full-run pair that
    // straddles the split must be found by the probe
    val straddling = full.keys.filter { case (a, b) =>
      (a % 5 == 0) != (b % 5 == 0) }.toSet
    val got = probe.map(r =>
      (r.getLong(0) min r.getLong(1), r.getLong(0) max r.getLong(1))).toSet
    assert(straddling == got,
      s"probe missed ${straddling.diff(got)} / extra ${got.diff(straddling)}")
  }

  test("round-8 plan shapes: broadcasts stay broadcast, no global sorts sneak in") {
    // q114: the 4096-row log-ratio table must enter as a broadcast —
    // a shuffled join here would re-partition the full token stream
    val p114 = Curation.q114DsirSelect(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p114.contains("BroadcastHashJoin"), p114.linesIterator.take(12).mkString("\n"))
    assert(!p114.contains("SortMergeJoin"), "q114 lam join fell back to SMJ")
    // q110: the bucket NTILE must be keyed by language, never a single
    // global window (the CCNet bucketing is per-language by design)
    val p110 = graft.operators.TextOps.q110DocPerplexity(spark, sfDir)
      .queryExecution.executedPlan.toString
    val ntileLine = p110.linesIterator.find(_.contains("ntile"))
    assert(ntileLine.exists(_.contains("lang")),
      s"q110 ntile window is not partitioned by lang: $ntileLine")
    // q115: the register reduction must aggregate partially map-side
    // (partial/final pair), keeping the shuffle at 64 rows per column
    val p115 = graft.operators.Relational.q115PortableHll(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p115.contains("partial_max") || p115.contains("max#") ||
      p115.contains("partial"), "q115 lost its map-side register combine")
    // q121: the probe side must broadcast and the corpus side must be
    // scored without a cartesian fallback; the window input must carry
    // no embedding payload (the arrays stay below the exchange)
    val p121 = graft.operators.Similarity.q121HardNegatives(spark, sfDir)
      .queryExecution.executedPlan
    val p121s = p121.toString
    assert(p121s.contains("BroadcastNestedLoopJoin") || p121s.contains("BroadcastHashJoin"),
      "q121 probe side is not broadcast")
    assert(!p121s.contains("CartesianProduct"), "q121 fell back to a cartesian")
    val winNode = graft.operators.Similarity.q121HardNegatives(spark, sfDir)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.head
    val winCols = winNode.child.output.map(_.name)
    assert(!winCols.contains("embedding") && !winCols.contains("probe_vec"),
      s"q121 window input still carries vectors: $winCols")
    // q119: exactly one exchange (the md5 groupBy) — normalization is
    // map-side, and the variant union must not add its own shuffle
    val p119 = Dedup.q119NormDedup(spark, sfDir)
      .queryExecution.executedPlan.toString
    val nEx119 = p119.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(nEx119 <= 2, s"q119 has $nEx119 exchanges (hash agg + order expected):\n" +
      p119.linesIterator.filter(_.trim.startsWith("Exchange")).mkString("\n"))
    // q120: the gram exchange must carry hashed LONG ids, not gram
    // strings (r14: the projection is the native shingle_hash fusion,
    // bit-equal to the previous xxhash64 HOF — ShingleHashSpec)
    val p120 = TextOps.q120GopherRules(spark, sfDir)
      .queryExecution.executedPlan.toString
    // r14 advice: every consumer emits shingle_hash now, so the old
    // `|| xxhash64` escape hatch would mask a silent regression back to
    // the interpreted HOF — assert the native fusion specifically
    assert(p120.contains("shingle_hash"),
      "q120 lost its native shingle_hash projection (interpreted-HOF regression?)")
  }

  test("q116 count-min never undercounts and ranks the true heavy hitters") {
    import graft.operators.Relational
    val rows = Relational.q116CountMin(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"CMS undercounted: $r")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1), s"overcount wrong: $r")
    }
    // the probe set really is the exact top-10 (desc count, asc token)
    val exactTop = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").count()
      .orderBy(col("count").desc, col("token"))
      .limit(10).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == exactTop)
  }

  test("q116 core under collision pressure: one-sided error, width monotone") {
    import graft.operators.Relational
    val tokCounts = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
    // w=4 forces collisions the production w=256 never sees on this
    // vocabulary: the sketch must OVERcount somewhere yet never under
    val narrow = Relational.cmsEstimate(tokCounts, 4, 4).collect()
    assert(narrow.forall(r => r.getLong(2) >= r.getLong(1)),
      "narrow sketch undercounted")
    assert(narrow.exists(_.getLong(3) > 0),
      "w=4 produced no collisions — the test exercises nothing")
    // widening the table can only reduce total overcount
    val wide = Relational.cmsEstimate(tokCounts, 256, 4).collect()
    assert(wide.map(_.getLong(3)).sum <= narrow.map(_.getLong(3)).sum,
      "wider sketch overcounted more than the narrow one")
  }

  test("q118 keeps the argmax-quality member of every dup cluster") {
    val out = Curation.q118CanonicalSelect(spark, sfDir).collect()
    assert(out.nonEmpty)
    // independent recomputation of the per-cluster argmax from the
    // operator's own inputs (clusters and quality are each separately
    // oracle-checked as q55/q48)
    val byCluster = Dedup.dupClusters(spark, sfDir)
      .join(TextOps.qualityScores(spark, sfDir).select("doc_id", "quality"), Seq("doc_id"))
      .collect().groupBy(_.getAs[Long]("cluster_id"))
    out.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      val ms = byCluster(cid).map(m =>
        (m.getAs[Double]("quality"), m.getAs[Long]("doc_id")))
      val best = ms.minBy { case (q, id) => (-q, id) }
      assert(r.getAs[Long]("kept_doc") == best._2,
        s"cluster $cid kept ${r.getAs[Long]("kept_doc")}, argmax is ${best._2}")
      assert(r.getAs[Long]("minid_doc") == ms.map(_._2).min)
      assert(r.getAs[Double]("quality_gain") >= 0.0,
        s"negative quality gain in cluster $cid")
      assert(r.getAs[Long]("n_members") == ms.length)
    }
    // the operator must actually change decisions on this corpus —
    // some clusters upgrade away from the min-id keeper, some don't
    assert(out.exists(_.getAs[Boolean]("upgraded")), "no cluster upgraded")
    assert(out.exists(!_.getAs[Boolean]("upgraded")), "every cluster upgraded")
  }

  test("q119 folds every surface variant onto its original; raw hash can't") {
    val out = Dedup.q119NormDedup(spark, sfDir).collect()
    val docIds = Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nVariants = docIds.count(_ % 7 == 0) + docIds.count(_ % 7 == 3)
    // group count = one per ORIGINAL doc: no variant may form its own
    // group, and no two originals may collide
    assert(out.length == docIds.size, s"${out.length} groups for ${docIds.size} docs")
    // every variant-carrying group keeps the original id, counts the
    // variant, and is visible to normalization only (raw hashes differ)
    val catches = out.filter(_.getAs[Boolean]("norm_only_catch"))
    assert(catches.length == nVariants,
      s"${catches.length} norm-only groups for $nVariants injected variants")
    catches.foreach { r =>
      assert(docIds.contains(r.getAs[Long]("keeper_id")), "variant became keeper")
      assert(r.getAs[Long]("n_copies") == 2 && r.getAs[Long]("n_raw_variants") == 2)
    }
    // untouched docs stay singleton groups
    out.filterNot(_.getAs[Boolean]("is_dup_group")).foreach { r =>
      assert(r.getAs[Long]("keeper_id") % 7 != 0 && r.getAs[Long]("keeper_id") % 7 != 3)
    }
  }

  test("q120 agrees with q57 at n=2 and with brute-force gram counting") {
    val out = TextOps.q120GopherRules(spark, sfDir).collect()
    assert(out.nonEmpty)
    // n=2 rows must equal q57's single-rule computation exactly
    val q57 = TextOps.q57Repetition(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val n2 = out.filter(_.getAs[Int]("n") == 2)
    assert(n2.length == q57.size)
    n2.foreach { r =>
      val t = q57(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_grams") == t.getAs[Long]("n_grams"))
      assert(r.getAs[Long]("top_n") == t.getAs[Long]("top_gram_n"))
      assert(r.getAs[Double]("top_frac") == t.getAs[Double]("top_gram_frac"))
    }
    // brute-force recount for a deterministic doc sample, every n
    val sample = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 97 === 0).select("doc_id", "text").collect()
    assert(sample.nonEmpty)
    val byKey = out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n")) -> r).toMap
    sample.foreach { s =>
      val toks = s.getAs[String]("text").split(" ", -1)
      TextOps.GopherNs.foreach { n =>
        val grams = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
        byKey.get((s.getAs[Long]("doc_id"), n)) match {
          case None => assert(grams.isEmpty, s"missing row for n=$n")
          case Some(r) =>
            val counts = grams.groupBy(identity).map(_._2.length)
            assert(r.getAs[Long]("n_grams") == grams.length)
            assert(r.getAs[Long]("top_n") == counts.max)
            assert(r.getAs[Long]("dup_n") == grams.length - counts.size)
        }
      }
    }
    // the real corpus passes every rule (verified above via the oracle);
    // the rules must still FIRE on actual boilerplate — drive the core
    // with constructed docs: one templated (top-gram dominated), one
    // doubled (every gram duplicated), one clean
    assert(out.forall(_.getAs[Boolean]("passes")))
    val sp = spark
    import sp.implicits._
    val clean = "the quick brown fox jumps over one lazy dog near a red barn today"
    val docs = Seq(
      (1L, Seq.fill(30)("click here now").mkString(" ")),
      (2L, clean + " " + clean),
      (3L, clean)).toDF("doc_id", "text")
    val core = TextOps.gopherRules(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n")) -> r).toMap
    // templated doc: its top 2-gram dominates -> top rule fails
    assert(!core((1L, 2)).getAs[Boolean]("passes"), "templated doc passed n=2")
    // doubled doc: >= half of all 5-gram occurrences are repeats
    assert(!core((2L, 5)).getAs[Boolean]("passes"), "doubled doc passed n=5")
    assert(core((2L, 5)).getAs[Double]("dup_frac") >= 0.4)
    // clean doc passes everything
    TextOps.GopherNs.filter(_ <= clean.split(" ").length).foreach { n =>
      assert(core((3L, n)).getAs[Boolean]("passes"), s"clean doc failed n=$n")
    }
  }

  test("q121 matches a driver-side brute force over every probe") {
    import graft.operators.Similarity
    val out = Similarity.q121HardNegatives(spark, sfDir).collect()
    assert(out.length > 0)
    // independent recompute: plain Scala, no Spark SQL — the SAME
    // sequential IEEE fold and HALF_UP rounding the engines use
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").toArray))
      .filter { case (_, _, v) =>
        math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)) > 0 }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def r6(x: Double): Double =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val byId = vecs.map(v => v._1 -> v).toMap
    out.foreach { r =>
      val (pid, plabel, pvec) = byId(r.getAs[Long]("probe_id"))
      assert(plabel == r.getAs[Int]("probe_label"))
      val scored = vecs.filter(_._1 != pid).map { case (id, l, v) =>
        (id, l, r6(dot(pvec, v) /
          (math.sqrt(dot(pvec, pvec)) * math.sqrt(dot(v, v)))))
      }
      def best(pos: Boolean) =
        scored.filter(t => (t._2 == plabel) == pos)
          .minBy { case (id, _, c) => (-c, id) }
      val (posId, _, posCos) = best(true)
      val (negId, _, negCos) = best(false)
      assert(r.getAs[Long]("pos_id") == posId, s"probe $pid pos mismatch")
      assert(r.getAs[Double]("pos_cos") == posCos, s"probe $pid pos_cos")
      assert(r.getAs[Long]("neg_id") == negId, s"probe $pid neg mismatch")
      assert(r.getAs[Double]("neg_cos") == negCos, s"probe $pid neg_cos")
    }
    // the mined margins must carry signal in both directions on this
    // corpus: confident probes and label-noise suspects
    assert(out.exists(_.getAs[Double]("margin") > 0))
    assert(out.exists(_.getAs[Double]("margin") < 0))
  }
}
