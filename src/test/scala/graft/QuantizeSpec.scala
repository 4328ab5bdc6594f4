package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Quantize

/** T47/T48 vector quantization (q145 PQ/ADC, q146 SQ8): native-codec
  * parity against an independent driver-side replay, null semantics,
  * ranking invariants, the measured recall floor, and the plan shape
  * (native encode/adc on the scan, no cartesian).
  */
class QuantizeSpec extends GraftSpec {

  private val M = Quantize.PqM
  private val K = Quantize.PqK
  private val D = Quantize.PqD

  /** Independent PQ encode replay: same fold order spelled with plain
    * Scala doubles, structured differently from PqBook (no n2c cache —
    * recomputed inline per candidate).
    */
  private def encodeRef(vec: Seq[Float], flat: Array[Double],
      m: Int, k: Int, d: Int): Long = {
    var code = 0L
    for (mi <- 0 until m) {
      var n2x = 0.0
      for (i <- 0 until d) { val x = vec(mi * d + i).toDouble; n2x += x * x }
      var bestK = 0
      var bestD2 = 0.0
      for (ki <- 0 until k) {
        val base = (mi * k + ki) * d
        var dot = 0.0
        var n2c = 0.0
        for (i <- 0 until d) {
          val x = vec(mi * d + i).toDouble
          dot += x * flat(base + i)
          n2c += flat(base + i) * flat(base + i)
        }
        val d2 = n2x - 2.0 * dot + n2c
        if (ki == 0 || d2 < bestD2) { bestD2 = d2; bestK = ki }
      }
      code |= bestK.toLong << (4 * mi)
    }
    code
  }

  test("pq_encode equals an independent driver-side replay on a frozen book") {
    val sp = spark
    import sp.implicits._
    // tiny frozen book: m=2 subspaces, k=2 centroids, d=2 dims
    val flat = Array(0.0, 0.0, 1.0, 1.0, /* m0: c0=(0,0) c1=(1,1) */
                     0.5, -0.5, -1.0, 2.0 /* m1: c0=(.5,-.5) c1=(-1,2) */)
    val vecs = Seq(
      Seq(0.1f, 0.1f, 0.4f, -0.4f),   // m0→c0, m1→c0
      Seq(0.9f, 1.2f, -0.8f, 1.9f),   // m0→c1, m1→c1
      Seq(0.5f, 0.5f, 0.5f, 0.5f))    // midpoints: tiebreaks
    val got = vecs.toDF("v")
      .select(call_function("pq_encode", col("v"),
        lit(flat), lit(Array(2, 2, 2))).as("c"))
      .collect().map(_.getLong(0))
    val want = vecs.map(v => encodeRef(v, flat, 2, 2, 2))
    assert(got.toSeq === want)
    // the midpoint vector must take the FIRST (lowest-cid) centroid in
    // any tied subspace — m0 is an exact tie between c0 and c1
    assert((got(2) & 0xfL) === 0L)
  }

  test("pq_encode parity on the real corpus under a real trained book") {
    val sp = spark
    import sp.implicits._
    // train the q145 book by running the operator once, then re-encode
    // the corpus natively and via the driver replay
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
    // rebuild the codebook exactly as q145 does: seeds = vec_id < K
    val byId = e.map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val seeds = (0 until K).map(i => byId(i.toLong))
    // one Lloyd round per subspace, decimal-exact means replayed with
    // BigDecimal to mirror the engine's DECIMAL(20,10) sums
    val flat = Array.ofDim[Double](M * K * D)
    for (mi <- 0 until M) {
      val assign = e.map { r =>
        val v = r.getSeq[Float](1)
        var bestK = 0
        var bestD2 = 0.0
        for (ki <- 0 until K) {
          var n2x = 0.0; var dot = 0.0; var n2c = 0.0
          for (i <- 0 until D) {
            val x = v(mi * D + i).toDouble
            val c = seeds(ki)(mi * D + i).toDouble
            n2x += x * x; dot += x * c; n2c += c * c
          }
          val d2 = n2x - 2.0 * dot + n2c
          if (ki == 0 || d2 < bestD2) { bestD2 = d2; bestK = ki }
        }
        (bestK, v)
      }
      for (ki <- 0 until K) {
        val members = assign.filter(_._1 == ki).map(_._2)
        for (i <- 0 until D) {
          val sum = members.map(v =>
              BigDecimal(v(mi * D + i).toDouble).setScale(10, BigDecimal.RoundingMode.HALF_UP))
            .foldLeft(BigDecimal(0))(_ + _)
          flat((mi * K + ki) * D + i) = sum.toDouble / members.size
        }
      }
    }
    val got = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        call_function("pq_encode", col("embedding"), lit(flat),
          lit(Array(M, K, D))).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byId.foreach { case (id, v) =>
      assert(got(id) === encodeRef(v, flat, M, K, D), s"vec $id")
    }
  }

  test("pq_adc equals a driver-side lut sum and null-poisons malformed input") {
    val sp = spark
    import sp.implicits._
    val lut = (0 until M * K).map(i => (i * 37 % 101).toLong)
    val codes = Seq(0L, 0x0123456789abcdefL & 0x7777777777777777L, 0xffffffffffffffffL)
    def ref(code: Long): Long =
      (0 until M).map(mi => lut(mi * K + ((code >>> (4 * mi)) & 0xfL).toInt)).sum
    val got = codes.toDF("code")
      .select(call_function("pq_adc", col("code"), lit(lut.toArray),
        lit(Array(M, K))).as("a"))
      .collect().map(_.getLong(0))
    assert(got.toSeq === codes.map(ref))
    // malformed: lut length != m*k → null; null code → null
    val bad = Seq(1L).toDF("code")
      .select(call_function("pq_adc", col("code"), lit(Array(1L, 2L)),
        lit(Array(M, K))).as("a"))
      .collect()
    assert(bad.head.isNullAt(0))
    val nullCode = Seq[Option[Long]](None).toDF("code")
      .select(call_function("pq_adc", col("code"), lit(lut.toArray),
        lit(Array(M, K))).as("a"))
      .collect()
    assert(nullCode.head.isNullAt(0))
  }

  test("pq_encode null-poisons a wrong-length or null vector") {
    val sp = spark
    import sp.implicits._
    val flat = Array.fill(2 * 2 * 2)(0.5)
    val out = Seq(Some(Seq(1f, 2f, 3f)), None, Some(Seq(1f, 2f, 3f, 4f)))
      .toDF("v")
      .select(call_function("pq_encode", col("v"), lit(flat),
        lit(Array(2, 2, 2))).as("c"))
      .collect()
    assert(out(0).isNullAt(0)) // length 3 != m*d = 4
    assert(out(1).isNullAt(0)) // null vector
    assert(!out(2).isNullAt(0))
  }

  test("q145 ranking invariants, determinism, and the measured recall floor") {
    val r1 = Quantize.q145PqAdc(spark, sfDir).collect()
    val r2 = Quantize.q145PqAdc(spark, sfDir).collect()
    assert(r1.toSeq === r2.toSeq, "q145 must be deterministic")
    assert(r1.length === Quantize.PqProbes * Quantize.PqTopK)
    r1.groupBy(_.getLong(0)).foreach { case (probe, rows) =>
      val byRk = rows.sortBy(_.getLong(1))
      assert(byRk.map(_.getLong(1)).toSeq === (1L to 10L), s"probe $probe ranks")
      val adc = byRk.map(_.getLong(3))
      assert(adc.zip(adc.tail).forall { case (a, b) => a <= b },
        s"probe $probe adc_u must be nondecreasing in rank")
      assert(rows.forall(r => r.getLong(2) != probe), "self-pair excluded")
    }
    // recall@10 vs the exact d2 top-10 (driver-side brute force on the
    // 500-vector fixture). Measured 0.34 on this deterministic corpus —
    // isotropic random unit vectors are PQ's WORST case (no cluster
    // structure) and chance is 10/499 ≈ 0.02; floor pinned at 0.2.
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val hits = (0 until Quantize.PqProbes).map { p =>
      val pv = e(p.toLong)
      val exact = e.toSeq.filter(_._1 != p.toLong)
        .map { case (id, v) => (d2(pv, v), id) }.sorted.take(10).map(_._2).toSet
      val adc = r1.filter(_.getLong(0) == p.toLong).map(_.getLong(2)).toSet
      (exact & adc).size
    }.sum
    assert(hits >= 0.2 * Quantize.PqProbes * Quantize.PqTopK,
      s"recall@10 = ${hits / 100.0} below the 0.2 floor")
  }

  test("q145 plan: native encode+adc on the scan, no cartesian, broadcast luts") {
    val plan = Quantize.q145PqAdc(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("pq_encode"), "encode must be the native expression")
    assert(plan.contains("pq_adc"), "adc must be the native expression")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "probe luts must broadcast")
  }

  test("q146 per-label report: coverage, exact integer arithmetic, error bound") {
    val rows = Quantize.q146Sq8(spark, sfDir).collect()
    assert(rows.length === 10)
    val nVecs = rows.map(_.getLong(1)).sum
    assert(nVecs === 500L)
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(1) * Quantize.SqDims, "n_dims = 64·n_vectors")
      assert(r.getLong(3) >= 0L)
      assert(r.getLong(4) <= r.getLong(3), "max err_p cannot exceed the sum")
      // int8 over unit-norm embeddings: per-dim range < 2.2, step <
      // 2.2/255, max sq err ≈ (step/2)² < 2e-5 → well under 1e9 pico
      assert(r.getLong(4) < 1000000000L,
        s"label ${r.getInt(0)} max_err_pico ${r.getLong(4)} out of band")
    }
  }

  // ---- T49: vec_sub + q147 IVFADC ----

  test("vec_sub equals the zip_with chain and poisons malformed inputs") {
    val rows = spark.sql(
      """SELECT
        | vec_sub(array(1.5D, -2.25D, 0.0D), array(0.5D, 1.0D, -4.5D)) AS ok,
        | vec_sub(cast(array(1.5, 2.5) AS array<float>), array(0.25D)) AS mismatch,
        | vec_sub(array(1.0D, cast(null AS double)), array(0.0D, 0.0D)) AS nullelem,
        | vec_sub(cast(null AS array<double>), array(0.0D)) AS nullarr
        |""".stripMargin).collect().head
    assert(rows.getSeq[Double](0) === Seq(1.0, -3.25, 4.5))
    assert(rows.isNullAt(1), "length mismatch must poison to null")
    assert(rows.isNullAt(2), "null element must poison to null")
    assert(rows.isNullAt(3), "null array must be null")
    // parity with the declarative HOF form on real corpus rows
    // (float − double: the exact mixed-width arithmetic q147 uses)
    val e = Tables.embeddings(spark, sfDir).limit(50)
      .withColumn("c", transform(col("embedding"), x => x.cast("double") * 0.25))
    val cmp = e.select(
      call_function("vec_sub", col("embedding"), col("c")).as("native"),
      zip_with(col("embedding"), col("c"),
        (x, y) => x.cast("double") - y).as("hof")).collect()
    cmp.foreach { r =>
      assert(r.getSeq[Double](0) === r.getSeq[Double](1),
        "vec_sub must be bit-identical to the zip_with fold")
    }
  }

  /** Driver-side replay of q147's coarse centroids (decimal-exact
    * means: Spark's cast(double→decimal(20,10)) is HALF_UP at scale
    * 10; the sum is exact decimal; the mean is sum-as-double / n) and
    * d2 routing — independent of the engine's lineage.
    */
  private def coarseRef(): Map[Int, Array[Double]] = {
    val byLabel = Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)).groupBy(_._1)
    byLabel.map { case (lbl, rows) =>
      val n = rows.length
      val cent = (0 until M * D).map { i =>
        val s = rows.map { case (_, v) =>
          new java.math.BigDecimal(v(i).toDouble)
            .setScale(10, java.math.RoundingMode.HALF_UP)
        }.reduce(_.add(_))
        s.doubleValue() / n
      }.toArray
      lbl -> cent
    }
  }

  private def d2Ref(a: Array[Double], b: Array[Double]): Double = {
    var n2a = 0.0; var dot = 0.0; var n2b = 0.0
    var i = 0
    while (i < a.length) {
      n2a += a(i) * a(i); dot += a(i) * b(i); n2b += b(i) * b(i); i += 1
    }
    n2a - 2.0 * dot + n2b
  }

  test("q147 invariants: routed-cell containment, determinism, ranking") {
    val r1 = Quantize.q147IvfAdc(spark, sfDir).collect()
    val r2 = Quantize.q147IvfAdc(spark, sfDir).collect()
    assert(r1.toSeq === r2.toSeq, "q147 must be deterministic")
    assert(r1.length === Quantize.PqProbes * Quantize.PqTopK)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray)).toMap
    val coarse = coarseRef()
    r1.groupBy(_.getLong(0)).foreach { case (probe, rows) =>
      // independent routing replay: nprobe nearest cells by exact d2
      val pv = e(probe)._2
      val routed = coarse.toSeq
        .map { case (cell, c) => (d2Ref(pv, c), cell) }
        .sorted.take(Quantize.IvfNprobe).map(_._2).toSet
      val byRk = rows.sortBy(_.getLong(1))
      assert(byRk.map(_.getLong(1)).toSeq === (1L to Quantize.PqTopK.toLong),
        s"probe $probe ranks")
      val adc = byRk.map(_.getLong(4))
      assert(adc.zip(adc.tail).forall { case (a, b) => a <= b },
        s"probe $probe adc_u must be nondecreasing in rank")
      rows.foreach { r =>
        val cand = r.getLong(3)
        assert(cand != probe, "self-pair excluded")
        assert(r.getInt(2) === e(cand)._1,
          s"candidate $cand reported cell must be its label cell")
        assert(routed.contains(r.getInt(2)),
          s"probe $probe candidate $cand cell ${r.getInt(2)} outside the " +
            s"independently-replayed routed set $routed")
      }
    }
    // recall@10 vs the exact d2 top-10 WITHIN the routed cells (the
    // ADC-quality audit; coarse routing quality is the q46 story).
    val hits = r1.groupBy(_.getLong(0)).toSeq.map { case (probe, rows) =>
      val pv = e(probe)._2
      val routed = coarse.toSeq
        .map { case (cell, c) => (d2Ref(pv, c), cell) }
        .sorted.take(Quantize.IvfNprobe).map(_._2).toSet
      val exact = e.toSeq
        .filter { case (id, (lbl, _)) => id != probe && routed.contains(lbl) }
        .map { case (id, (_, v)) =>
          (v.zip(pv).map { case (x, y) => (x - y) * (x - y) }.sum, id) }
        .sorted.take(Quantize.PqTopK).map(_._2).toSet
      (exact & rows.map(_.getLong(3)).toSet).size
    }.sum
    // measured 0.43 on the isotropic fixture — ABOVE q145's flat-PQ
    // 0.34 even though both run PQ's worst case (random unit vectors),
    // the residual-encoding win in miniature; chance within 2 cells of
    // ~100 candidates is ~0.1. Floor pinned clear of chance.
    assert(hits >= 0.2 * Quantize.PqProbes * Quantize.PqTopK,
      s"in-cell recall@10 = ${hits / 100.0} below the 0.2 floor")
  }

  test("q147 plan: native residual+encode+adc on the scan, no cartesian") {
    val plan = Quantize.q147IvfAdc(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("vec_sub"), "residual must be the native vec_sub")
    assert(plan.contains("pq_encode"), "encode must be the native expression")
    assert(plan.contains("pq_adc"), "adc must be the native expression")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("zip_with"), "no interpreted residual HOF on the scan")
  }
}
