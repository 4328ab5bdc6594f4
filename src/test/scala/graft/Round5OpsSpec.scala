package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Edgar, Extended, Relational, Similarity}

/** Round-5 operators: densified time series (q88), VARIANT extraction
  * (q89), distributed k-means (q90), snapshot diff (q91), winsorization
  * (q92), XML extraction (q93), collation dedup (q94) — invariants beyond
  * the DuckDB hash gate — plus the Observation API as the zero-extra-pass
  * pipeline audit.
  */
class Round5OpsSpec extends GraftSpec {

  test("q88 calendar is dense: one row per day per priority, no gaps") {
    val rows = Extended.q88TsFill(spark, sfDir).collect()
    val byPriority = rows.groupBy(_.getString(0))
    byPriority.foreach { case (p, rs) =>
      val days = rs.map(_.getString(1)).sorted
      val first = java.time.LocalDate.parse(days.head)
      val last = java.time.LocalDate.parse(days.last)
      val span = java.time.temporal.ChronoUnit.DAYS.between(first, last) + 1
      assert(days.length == span, s"$p: ${days.length} rows over $span days")
      assert(days.distinct.length == days.length, s"$p: duplicate days")
    }
    // forward fill: after the first day every revenue_ffill is defined
    rows.groupBy(_.getString(0)).foreach { case (p, rs) =>
      rs.sortBy(_.getString(1)).foreach { r =>
        assert(!r.isNullAt(3), s"$p ${r.getString(1)}: null ffill")
      }
    }
    // gap days carry the previous observed value
    val gap = rows.filter(!_.getBoolean(2))
    assert(gap.nonEmpty, "sf0.001 should have unobserved days")
  }

  test("q89 variant extraction is total: absent paths count zero, k sums real") {
    val rows = Relational.q89VariantExtract(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(5) == 0L, s"absent path must never materialize: $r")
      assert(r.getLong(1) > 0 && r.getLong(2) >= 0)
    }
  }

  test("q90 kmeans partitions all vectors and clusters are nonempty") {
    val rows = Similarity.q90Kmeans(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= Similarity.KmeansK)
    val total = rows.map(_.getLong(1)).sum
    val nVectors = Tables.embeddings(spark, sfDir).count()
    assert(total == nVectors, s"$total assigned of $nVectors")
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) >= -1e-9, s"mean d2 must be ~nonnegative: $r")
    }
  }

  test("q91 diff classification matches the modulus derivation rules") {
    val rows = Extended.q91TableDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = Tables.orders(spark, sfDir).select("o_orderkey")
      .collect().map(_.getLong(0))
    val expDeleted = keys.count(_ % 97 == 0)
    val expInserted = keys.count(_ % 101 == 0)
    val expChanged = keys.count(k => k % 97 != 0 && k % 13 == 0)
    assert(rows.getOrElse("deleted", 0L) == expDeleted)
    assert(rows.getOrElse("inserted", 0L) == expInserted)
    assert(rows.getOrElse("changed", 0L) == expChanged)
    assert(rows.values.sum == keys.length + expInserted)
    // every changed row drifted exactly +100.00
    val drift = Extended.q91TableDiff(spark, sfDir).collect()
      .find(_.getString(0) == "changed").map(_.getDouble(2))
    assert(drift.forall(_ == expChanged * 100.0), s"$drift vs ${expChanged * 100.0}")
  }

  test("q92 winsorized mean moves toward the center, clip counts ~5%") {
    Extended.q92Winsorize(spark, sfDir).collect().foreach { r =>
      val (n, nLow, nHigh) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // interpolated percentile: at most ~5% strictly outside each side
      assert(nLow <= n * 0.06 + 1, s"$r")
      assert(nHigh <= n * 0.06 + 1, s"$r")
      assert(nLow + nHigh > 0, "sf0.001 should clip something")
      val (p05, p95) = (r.getDouble(4), r.getDouble(5))
      val win = r.getDouble(7)
      assert(win >= p05 && win <= p95, s"winsorized mean outside clip range: $r")
    }
  }

  test("q93 XML parse recovers every order row typed") {
    val parsed = Edgar.q93XmlExtract(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    assert(parsed.count() == orders.count())
    val sample = parsed.limit(5).collect()
    sample.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getDouble(2) > 0 && r.getString(3).nonEmpty)
    }
  }

  test("q94 collation dedup folds exactly the two case variants per name") {
    val rows = Edgar.q94CollateDedup(spark, sfDir).collect()
    val nCustomers = Tables.customer(spark, sfDir).count()
    assert(rows.length == nCustomers, "one group per case-insensitive name")
    rows.foreach { r => assert(r.getLong(1) == 2L, s"expected 2 variants: $r") }
  }

  test("q95 struct-argmax picks the true extremes with deterministic ties") {
    val rows = Extended.q95ArgmaxAgg(spark, sfDir).collect()
    val orders = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().groupBy(_.getLong(0))
    rows.foreach { r =>
      val os = orders(r.getLong(0))
      val maxPrice = os.map(_.getDouble(2)).max
      assert(r.getDouble(4) == maxPrice, s"best_price mismatch: $r")
      // tiebreak: among max-price orders, the HIGHEST key (struct max)
      val expKey = os.filter(_.getDouble(2) == maxPrice).map(_.getLong(1)).max
      assert(r.getLong(5) == expKey, s"best_key tiebreak mismatch: $r")
    }
  }

  test("q96 hierarchy walk resolves every node to the arithmetic root/depth") {
    val rows = Extended.q96Hierarchy(spark, sfDir).collect()
    val keys = Tables.customer(spark, sfDir).select("c_custkey")
      .collect().map(_.getLong(0))
    assert(rows.length == keys.length, "every node resolves exactly once")
    rows.foreach { r =>
      val (k, root, depth) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // parent = k div 10 ⇒ root is the leading digit, depth = #digits-1
      var (cur, d) = (k, 0L)
      while (cur >= 10) { cur /= 10; d += 1 }
      assert(root == cur && depth == d, s"$k -> ($root, $depth), want ($cur, $d)")
    }
  }

  test("registerViews exposes every corpus table to raw SQL by oracle name") {
    Tables.registerViews(spark, sfDir)
    val n = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(n > 0)
    // events.ts must carry the converted (micros) timestamp, not raw int64
    val t = spark.sql("SELECT ts FROM events LIMIT 1").schema.head.dataType
    assert(t == org.apache.spark.sql.types.TimestampType, t.toString)
    Tables.schemas.keys.foreach { name =>
      assert(spark.catalog.tableExists(name), s"view $name missing")
    }
  }

  test("q97 stage-yield buckets partition the corpus and survivors telescope") {
    val rows = Extended.q97StageYield(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val total = Tables.orders(spark, sfDir).count()
    assert(rows.map(_._2).sum == total, "every record lands in exactly one bucket")
    // survivors_through(s) = stranded(s) + survivors_through(s+1)
    rows.sliding(2).foreach {
      case Array((_, n, surv), (_, _, survNext)) =>
        assert(surv == n + survNext, rows.mkString(", "))
      case _ =>
    }
    assert(rows.head._3 == total, "stage 1 survivors = everything")
  }

  test("q98 frame sampling respects stride and covers frame 0 of every video") {
    val rows = graft.operators.Multimodal.q98FrameSample(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val videos = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 2).count()
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.size == videos, "every video doc contributes frames")
    byDoc.foreach { case (docId, fs) =>
      val stride = docId % 5 + 1
      val idxs = fs.map(_._2).sorted
      assert(idxs.head == 0L, s"doc $docId missing frame 0")
      idxs.foreach(i => assert(i % stride == 0, s"doc $docId frame $i off-stride"))
    }
  }

  test("q99 residuals sum to ~zero per margin; q100 shares are a prefix of 1") {
    val cells = Extended.q99Contingency(spark, sfDir).collect()
    val total = Tables.orders(spark, sfDir).count()
    // expected counts reproduce the grand total (independence preserves n)
    assert(math.abs(cells.map(_.getDouble(3)).sum - total) < 0.01)
    assert(cells.map(_.getLong(2)).sum == total)

    val hot = Extended.q100SkewProfile(spark, sfDir).collect()
    assert(hot.length == Extended.SkewTopK)
    val shares = hot.map(_.getDouble(3))
    assert(shares.sum <= 1.0 + 1e-6)
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b },
      "top-k shares must be non-increasing")
    hot.foreach(r => assert(r.getDouble(4) >= 0.0))
  }

  test("q101 chained work-list agrees with its component operators") {
    val worklist = Edgar.q101EdgarWorklist(spark, sfDir).collect()
    val filings = Edgar.q20EdgarIndexParse(spark, sfDir).collect()
    val processed = filings.count { r =>
      val acc = r.getLong(3).toString
      java.security.MessageDigest.getInstance("MD5").digest(acc.getBytes)
        .take(1).map("%02x".format(_)).mkString < "0d"
    }
    assert(worklist.length == filings.length - processed,
      s"${worklist.length} != ${filings.length} - $processed")
    // registry names in the chain match q21's last-wins registry
    val reg = Edgar.q21CikRegistry(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    worklist.take(20).foreach { r =>
      assert(reg(r.getLong(1)) == r.getString(2), s"registry mismatch: $r")
    }
  }

  test("q102 temporal join matches at most one version, containing the event") {
    val rows = Relational.q102TemporalJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // event_ids unique ⇒ each fact matched at most one version
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "a fact matched multiple versions")
    // the matched version's interval genuinely contains the event time
    val versions = Relational.q70Scd2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getTimestamp(3), Option(r.getTimestamp(4)))).toMap
    rows.foreach { r =>
      val ts = r.getTimestamp(2)
      val (from, to) = versions((r.getLong(1), r.getLong(3)))
      assert(!ts.before(from) && to.forall(ts.before(_)), s"containment: $r")
    }
  }

  test("round-5 results are invariant under an adversarial partitioning") {
    // the §4 partition-order-proof claim, exercised: a prime partition
    // count with AQE coalescing off must not change a single output row
    val sp = spark
    val oldParts = sp.conf.get("spark.sql.shuffle.partitions")
    val oldAqe = sp.conf.get("spark.sql.adaptive.enabled")
    def run() = Seq(
      operators.Extended.q88TsFill(sp, sfDir),
      operators.Similarity.q90Kmeans(sp, sfDir),
      operators.Extended.q91TableDiff(sp, sfDir),
      operators.Extended.q95ArgmaxAgg(sp, sfDir),
      operators.Extended.q96Hierarchy(sp, sfDir)
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

  test("Observation API audits the curation gate without a second pass") {
    val d = Tables.documents(spark, sfDir)
    val obs = Observation("curation-audit")
    val scored = d
      .withColumn("quality", graft.operators.TextOps.qualityExpr(col("text")))
      .withColumn("keep", col("quality").isNull || col("quality") >= 0.4)
      .observe(obs,
        count(lit(1)).as("n_total"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"))
    val kept = scored.filter(col("keep")).count()
    val metrics = obs.get
    val total = metrics("n_total").asInstanceOf[Long]
    val dropped = metrics("n_dropped").asInstanceOf[Long]
    assert(total == d.count())
    assert(total - dropped == kept,
      s"observed $total/$dropped vs counted $kept")
  }
}
