package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class Round9OpsSpec extends GraftSpec {

  test("q123 sampled percentiles track the exact ones at the sample's rank error") {
    val rows = Relational.q123SampledPercentile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      val nS = r.getLong(2)
      // deterministic 13/256 rate: binomial concentration, wide margin
      assert(math.abs(nS.toDouble / n - 13.0 / 256) < 0.03, s"rate off: $r")
      // rank error is O(1/sqrt(n_sample)); at sf0.001 a group samples
      // ~16 rows, so allow 2/sqrt(n_sample) relative slack. The oracle
      // checks exactness of the VALUES; this checks the estimator is
      // genuinely close at its expected rate.
      val bound = 2.0 / math.sqrt(nS.toDouble)
      assert(r.getDouble(5) <= bound, s"p50 rel err > $bound: $r")
      assert(r.getDouble(8) <= bound, s"p90 rel err > $bound: $r")
    }
  }

  test("q123 is invariant under partitioning (hash sample, no RNG)") {
    val a = Relational.q123SampledPercentile(spark, sfDir).collect().toSeq
    val b = Relational.q123SampledPercentile(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("q124 weighted sample is deterministic and biased toward quality") {
    import graft.operators.{Curation, TextOps}
    val sample = Curation.q124WeightedSample(spark, sfDir).collect()
    assert(sample.length == Curation.WsK)
    // no RNG anywhere: a rerun is bit-identical
    val again = Curation.q124WeightedSample(spark, sfDir).collect()
    assert(sample.toSeq == again.toSeq)
    // the WEIGHTED part: E-S priorities favor high-quality docs, so the
    // sample's mean quality must beat the corpus mean. The corpus'
    // quality spread is narrow (weights 0.7-1.0), so the uplift is small
    // but — everything being hash-deterministic — perfectly stable.
    val corpusMean = TextOps.qualityScores(spark, sfDir)
      .agg(avg("quality")).head.getDouble(0)
    val sampleMean = sample.map(_.getDouble(1)).sum / sample.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean vs corpus $corpusMean")
    // priorities are the actual top-k under (priority DESC, doc_id ASC):
    // recompute the UNLIMITED priority table and check the kept set is
    // exactly its head, i.e. no dropped row orders before any kept row
    val q = TextOps.qualityScores(spark, sfDir).select("doc_id", "quality")
    val wCol = col("quality") + lit(0.1)
    val uCol = (graft.functions.TextFunctions.md5Long(col("doc_id")) + lit(1L))
      .cast(org.apache.spark.sql.types.DoubleType) / lit(1152921504606846976.0)
    val allPr = q.withColumn("priority", round(log(uCol) / wCol, 6))
      .select("doc_id", "priority").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(allPr.length > Curation.WsK, "need dropped rows to test against")
    // the query's sort key: priority DESC, doc_id ASC
    val expectedIds = allPr
      .sortBy { case (id, pr) => (-pr, id) }
      .take(Curation.WsK).map(_._1).toSet
    assert(sample.map(_.getLong(0)).toSet == expectedIds,
      "kept set is not the head of the full priority ordering")
    val minKept = sample.map(_.getDouble(2)).min
    assert(minKept <= 0.0, "ln-space priorities must be <= 0")
  }

  test("q125 overlap matrix agrees with an independent set intersection") {
    import graft.operators.Dedup
    import graft.functions.TextFunctions
    val rows = Dedup.q125SourceOverlap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (shared, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(sa < sb, s"pair not canonical: $r")
      assert(shared >= 1 && shared <= math.min(na, nb), s"bounds: $r")
      val j = r.getDouble(5)
      assert(j > 0 && j <= 1.0, s"jaccard range: $r")
    }
    // independent recomputation for the first pair: distinct shingle-id
    // sets intersected driver-side (sf0.001 — small enough to collect)
    val (sa, sb, shared) =
      (rows.head.getString(0), rows.head.getString(1), rows.head.getLong(2))
    def ids(src: String): Set[Long] =
      Tables.documents(spark, sfDir).filter(col("source") === src)
        .withColumn("toks", split(col("text"), " "))
        .select(explode(
          TextFunctions.hashedShinglesFromTokens(col("toks"), 5)).as("h"))
        .distinct().collect().map(_.getLong(0)).toSet
    assert((ids(sa) & ids(sb)).size.toLong == shared)
  }

  test("q126 calibration is a valid per-source quantile map") {
    import graft.operators.Curation
    val rows = Curation.q126QualityCalibrate(spark, sfDir).collect()
    assert(rows.length == 500)
    // within each source: pct is monotone in (quality, doc_id), spans
    // [0, 1], and the keep cutoff drops ~the worst quartile
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val sorted = rs.sortBy(r => (r.getDouble(2), r.getLong(0)))
      val pcts = sorted.map(_.getDouble(3))
      assert(pcts.head == 0.0 && pcts.last == 1.0, s"$src pct span")
      assert(pcts.zip(pcts.tail).forall { case (a, b) => a <= b }, s"$src monotone")
      val kept = rs.count(_.getBoolean(4)).toDouble / rs.length
      assert(kept > 0.6 && kept < 0.9, s"$src kept fraction $kept")
    }
    // calibration makes keep rates uniform across sources even when raw
    // quality distributions differ: every source keeps 3/4 +- ties
    val keptBySource = rows.groupBy(_.getString(1))
      .map { case (_, rs) => rs.count(_.getBoolean(4)).toDouble / rs.length }
    assert(keptBySource.max - keptBySource.min < 0.1,
      s"calibrated keep rates diverge: $keptBySource")
  }

  test("q127 datasheet totals reconcile with the whole corpus") {
    import graft.operators.Curation
    val rows = Curation.q127CorpusDatasheet(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val d = Tables.documents(spark, sfDir)
    assert(rows.map(_.getLong(1)).sum == d.count())
    val totalTokens = d.select(sum(size(split(col("text"), " ")).cast("long")))
      .head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalTokens)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0, s"dup_rate: $r")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, s"pct_en: $r")
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0, s"mean_quality: $r")
    }
  }

  test("q128 cohort retention is a valid probability matrix") {
    val rows = Relational.q128RetentionCohorts(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, a, ret) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(a >= 1 && a <= n, s"active outside cohort: $r")
      assert(ret > 0.0 && ret <= 1.0, s"retention range: $r")
    }
    // week 0 retention is exactly 1.0: the signup event itself is
    // activity at k = 0 for every cohort member
    rows.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getDouble(4) == 1.0, s"week-0 retention != 1: $r")
    }
    // cohort sizes are consistent across a cohort's rows
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).distinct.length == 1)
    }
  }

  test("round-9 results are invariant under an adversarial partitioning") {
    // §4's partition-order-proof claim for the round's additions: a
    // prime partition count with AQE off must not change one output row
    import graft.operators.{Curation, Dedup}
    val sp = spark
    val oldParts = sp.conf.get("spark.sql.shuffle.partitions")
    val oldAqe = sp.conf.get("spark.sql.adaptive.enabled")
    def run() = Seq(
      Relational.q123SampledPercentile(sp, sfDir),
      Curation.q124WeightedSample(sp, sfDir),
      Dedup.q125SourceOverlap(sp, sfDir),
      Curation.q126QualityCalibrate(sp, sfDir),
      Curation.q127CorpusDatasheet(sp, sfDir),
      Relational.q128RetentionCohorts(sp, sfDir)
    ).map(_.collect().toSeq)
    val base = run()
    try {
      sp.conf.set("spark.sql.shuffle.partitions", "7")
      sp.conf.set("spark.sql.adaptive.enabled", "false")
      val alt = run()
      base.zip(alt).zipWithIndex.foreach { case ((b, a), i) =>
        assert(b == a, s"query #$i diverged under 7-way/no-AQE partitioning")
      }
    } finally {
      sp.conf.set("spark.sql.shuffle.partitions", oldParts)
      sp.conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }

  test("round-9 plans keep their scale shapes") {
    import graft.operators.{Curation, Dedup}
    // q124: weighted sampling must be TakeOrdered over a map-side
    // projection — no global sort, no window, no exchange of the corpus
    val p124 = Curation.q124WeightedSample(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p124.contains("TakeOrderedAndProject"),
      s"q124 lost its TakeOrdered top-k:\n${p124.linesIterator.take(10).mkString("\n")}")
    assert(!p124.contains("Window"), "q124 grew a window")
    // q125: the pair stage must be a keyed shingle join — never a
    // cartesian/BNLJ between sources
    val p125 = Dedup.q125SourceOverlap(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p125.contains("CartesianProduct"), "q125 cartesian")
    assert(!p125.contains("BroadcastNestedLoopJoin"), "q125 BNLJ")
    // q123: both percentile aggregations are partial+final pairs (the
    // sample filter reaches the scan side, not a post-shuffle filter)
    val p123 = graft.operators.Relational.q123SampledPercentile(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p123.contains("partial_"), "q123 lost map-side partial aggregation")
  }
}
