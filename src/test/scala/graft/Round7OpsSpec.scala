package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.CleanNumericExprs
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

  /** Materialize n samples from a generator with a fixed seed. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, Seed(0x7eedL + i)))
  }

  /** Independent reference cleaner: the ORIGINAL declarative chain's
    * semantics re-stated through java.util.regex — the same regexes the
    * retired Column composition (and the live DuckDB twin) use. The
    * native expression's hand-rolled single pass must agree bit-for-bit
    * on ANY string, not just the corpus-shaped ones the oracle sees.
    */
  private def refClean(raw: String): Double = {
    val s = raw.replaceAll("\\A +", "").replaceAll(" +\\z", "")
    val neg = s.startsWith("(") || (s.startsWith("-") && s != "-")
    val t = s.replace('I', '1').replace('l', '1').replaceAll("[^0-9.]", "")
    val digitsOnly = t.replaceAll("[^0-9]", "")
    val nPeriods = t.length - t.replaceAll("\\.", "").length
    val m = java.util.regex.Pattern.compile("^(.*)\\.([^.]*)$").matcher(t)
    val (intRaw, decp) = if (m.matches()) (m.group(1), m.group(2)) else ("", "")
    val ic = intRaw.replaceAll("\\.", "")
    val mag =
      if (digitsOnly.isEmpty) 0.0
      else if (nPeriods == 0) t.toDouble
      else if (decp.length >= 1 && decp.length <= 2)
        ((if (ic.nonEmpty) ic else "0") + "." + decp).toDouble
      else { val s2 = ic + decp; (if (s2.nonEmpty) s2 else "0").toDouble }
    if (neg) -mag else mag
  }

  test("clean_numeric matches the regex-reference cleaner on arbitrary strings") {
    val junk: Gen[String] = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("(", ")", "-", ".", ",", "$", "I", "l", " ", "0",
        "9", "1")).map(_.mkString),
      Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString))
    val edge = Seq("", ".", "-", "-.", "(", "()", "...", "1.2.3.4", "..12..",
      "  (1,234.56) ", "-0.00", "1.", ".5", "I,lII.l2", "$-", "9" * 40,
      ("1" * 20) + "." + ("2" * 20))
    (samples(junk, 600) ++ edge).distinct.foreach { s =>
      val got = CleanNumericExprs.clean(UTF8String.fromString(s))
        .asInstanceOf[Double]
      val want = refClean(s)
      assert(java.lang.Double.compare(got, want) == 0,
        s"clean mismatch for ${s.take(60)}: got $got, want $want")
    }
  }

  test("messy/clean round-trip recovers round(value, 2) for every variant") {
    val cases: Gen[(Double, Long)] = for {
      v <- Gen.oneOf(Gen.choose(0.001, 9.0), Gen.choose(0.01, 999999.99),
        Gen.choose(1.0e6, 9.99e8))
      k <- Gen.choose(0L, 1000000000000L)
    } yield (v, k)
    samples(cases, 600).foreach { case (v, k) =>
      val cents = java.math.BigDecimal.valueOf(v * 100)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      val r2 = cents / 100.0
      val want = (k % 6) match {
        case 4 => 0.0 // the bare-dash "null-ish" variant cleans to zero
        case 1 | 5 => -r2 // parens / leading hyphen = negative
        case _ => r2
      }
      val messy = CleanNumericExprs.messy(v, k)
      val got = CleanNumericExprs.clean(messy).asInstanceOf[Double]
      assert(java.lang.Double.compare(got, want) == 0,
        s"roundtrip mismatch for v=$v k=$k messy=$messy: got $got, want $want")
    }
  }

  test("q109 LSH pairs are a verified subset of the brute-force tau-pairs") {
    import graft.operators.Dedup
    import graft.functions.VectorFunctions
    val got = Dedup.q109EmbedLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty, "LSH found no pairs at all on the test corpus")
    got.foreach { case (v1, v2, cos) =>
      assert(v1 < v2 && cos >= 0.35, s"bad pair ($v1, $v2, $cos)")
    }
    // brute force ALL pairs (test scale only — the operator exists so
    // this surface never runs in production)
    val e = graft.Tables.embeddings(spark, sfDir)
      .withColumn("nrm", sqrt(VectorFunctions.norm2(col("embedding"))))
      .filter(col("nrm") > 0)
    val brute = e.select(col("vec_id").as("v1"), col("embedding").as("e1"), col("nrm").as("n1"))
      .crossJoin(e.select(col("vec_id").as("v2"), col("embedding").as("e2"), col("nrm").as("n2")))
      .filter(col("v1") < col("v2"))
      .withColumn("cos",
        round(VectorFunctions.dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
      .filter(col("cos") >= 0.35)
      .select("v1", "v2", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    got.foreach(p => assert(brute.contains(p), s"LSH invented a pair: $p"))
    // candidates are banded-signature collisions, so recall is partial
    // by design — but it must be a real fraction of the ground truth
    assert(got.length * 5 >= brute.size,
      s"recall collapsed: ${got.length} of ${brute.size} pairs")
  }

  test("messy_numeric is total: NaN, infinities, negatives, extremes") {
    // the Column chain it replaced was total (Spark's Round passes
    // non-finite through; Cast truncates) — the native expression must
    // be too, even though the corpus never feeds these
    val adversarial = Seq(
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      0.0, -0.0, -1.23, -987654.321, Double.MinPositiveValue,
      Double.MaxValue, -Double.MaxValue, 1e-300, 4.9e8)
    val keys = Seq(Long.MinValue, -7L, -1L, 0L, 1L, 2L, 3L, 4L, 5L, 6L,
      Long.MaxValue)
    for (v <- adversarial; k <- keys) {
      val a = CleanNumericExprs.messy(v, k)
      val b = CleanNumericExprs.messy(v, k)
      assert(a != null && a == b, s"messy not total/deterministic for v=$v k=$k")
      // and the cleaner must take whatever messy produced without throwing
      val c = CleanNumericExprs.clean(a)
      assert(c != null, s"clean(messy($v, $k)) was null for ${a.toString}")
    }
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
