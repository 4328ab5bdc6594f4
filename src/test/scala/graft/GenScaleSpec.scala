package graft

import org.apache.spark.sql.functions._

/** GenScale is the soak bench's data source, so its two contract
  * properties are load-bearing: (1) determinism — the same (table, n)
  * regenerates bit-identically regardless of partitioning, or the
  * sf0.1-vs-sf1 timing ratio compares two different workloads; (2)
  * scale-invariant per-row shape — dup density, words/doc, lines/order
  * must NOT drift with n, or the measured exponent conflates data-shape
  * drift with engine scaling.
  */
class GenScaleSpec extends GraftSpec {

  test("documents regenerate bit-identically across partitionings") {
    val a = GenScale.documents(spark, 400).orderBy("doc_id").collect()
    val b = GenScale.documents(spark, 400).repartition(7)
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("documents hold the measured sf0.1 shape at two scales") {
    def shape(n: Long) = {
      val d = GenScale.documents(spark, n)
      val agg = d.agg(
        (lit(1.0) - countDistinct(col("text")) / count(lit(1))).as("dup_rate"),
        avg(size(split(col("text"), " "))).as("wpd"),
        avg(when(col("lang") === "en", 1.0).otherwise(0.0)).as("en_share"))
        .head
      (agg.getDouble(0), agg.getDouble(1), agg.getDouble(2))
    }
    val (dup1, wpd1, en1) = shape(2000)
    val (dup2, wpd2, en2) = shape(20000)
    // driver sf0.1 measured: dup 0.0016-0.003, wpd 54.1, en 0.41
    assert(dup1 > 0.0 && dup1 < 0.01, s"dup rate off: $dup1")
    assert(dup2 > 0.0 && dup2 < 0.01, s"dup rate off: $dup2")
    assert(math.abs(wpd1 - 54.5) < 3 && math.abs(wpd2 - 54.5) < 2,
      s"words/doc drifted: $wpd1 / $wpd2")
    assert(math.abs(en1 - 0.41) < 0.05 && math.abs(en2 - 0.41) < 0.03,
      s"en share drifted: $en1 / $en2")
  }

  test("near-copy docs land in the near-dup similarity band") {
    import spark.implicits._
    // copies point ≤51 ids back; reconstruct (copy, base) pairs by
    // regenerating the roll the generator used, then check token overlap
    val d = GenScale.documents(spark, 3000)
    val withRoll = d.withColumn("dup_roll",
      pmod(xxhash64(lit("dup"), col("doc_id")), lit(1000L)))
      .withColumn("base_id",
        greatest(lit(0L), col("doc_id") - lit(1L) -
          pmod(xxhash64(lit("off"), col("doc_id")), lit(50L))))
    val copies = withRoll.filter(col("dup_roll") < 22)
      .select(col("doc_id"), col("base_id"), col("dup_roll"), col("text"))
    // a base that is ITSELF a copy stores someone else's text (its
    // content id chains one hop further), so the copy/base texts
    // legitimately differ — compare only against non-copy bases
    val pureBases = withRoll.filter(col("dup_roll") >= 22)
      .select(col("doc_id"), col("text"))
    val joined = copies.alias("c")
      .join(pureBases.alias("b"), col("c.base_id") === col("b.doc_id"))
      .select(col("c.dup_roll"), col("c.text").as("ct"), col("b.text").as("bt"))
      .collect()
    assert(joined.length > 20, s"too few dup pairs: ${joined.length}")
    joined.foreach { r =>
      val roll = r.getLong(0)
      val ct = r.getString(1).split(" ")
      val bt = r.getString(2).split(" ")
      assert(ct.length == bt.length, "copy changed length")
      val diff = ct.zip(bt).count { case (x, y) => x != y }
      if (roll < 2) assert(diff == 0, s"exact copy differs in $diff words")
      else assert(diff <= 3, s"near copy drifted $diff words")
    }
  }

  test("heaps profile: anchored at v1, vocabulary grows, dup shape held") {
    // anchor identity: at the 5 000-doc anchor (V=31) the heaps profile
    // IS the v1 profile, bit for bit — the two soak series share their
    // sf0.1 point
    val a = GenScale.documents(spark, 5000).orderBy("doc_id").collect()
    val b = GenScale.documents(spark, 5000, heapsVocab = true)
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq, "heaps profile must equal v1 at the anchor")
    // Heaps' law: V ∝ √n — distinct tokens grow with the corpus instead
    // of saturating at 31 (the v1 ceiling that collapses the shingle
    // workload against the df cap at 30×)
    assert(GenScale.heapsV(5000) == 31 && GenScale.heapsV(50000) == 98 &&
      GenScale.heapsV(150000) == 170)
    val big = GenScale.documents(spark, 20000, heapsVocab = true)
    val nTok = big.select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct("t")).head.getLong(0)
    assert(nTok > 55 && nTok <= GenScale.heapsV(20000),
      s"vocabulary did not grow under heaps profile: $nTok")
    // the dup-injection shape is vocabulary-independent
    val dup = big.agg(
      (lit(1.0) - countDistinct(col("text")) / count(lit(1))).as("dup_rate"))
      .head.getDouble(0)
    assert(dup > 0.0 && dup < 0.01, s"dup rate off under heaps: $dup")
  }

  test("open profile: syllabic Zipf words, Heaps vocabulary, dup shape held") {
    // bit-identical regeneration across partitionings (the generator
    // contract every profile must keep)
    val a = GenScale.documents(spark, 3000, openVocab = true)
      .repartition(3).orderBy("doc_id").collect()
    val b = GenScale.documents(spark, 3000, openVocab = true)
      .repartition(17).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    // every word is a chain of consonant-vowel syllables — genuine
    // subword structure for the BPE trainer
    val words = GenScale.documents(spark, 3000, openVocab = true)
      .select(explode(split(col("text"), " ")).as("w"))
    val bad = words.filter(!col("w").rlike("^([bdgklmnprs][aeio])+$")).count()
    assert(bad === 0L, "open-profile words must be CV-syllable chains")
    // Zipf: the most frequent word covers a large share while the
    // distinct count tracks Heaps (V = 44*sqrt(tokens))
    val freq = words.groupBy("w").count().orderBy(desc("count")).collect()
    val total = freq.map(_.getLong(1)).sum
    assert(freq.head.getLong(1) > total / 40,
      s"head word too flat for Zipf: ${freq.head}")
    val vCap = GenScale.openV(3000)
    assert(freq.length > vCap / 4 && freq.length <= vCap,
      s"distinct=${freq.length} outside the Heaps band (cap $vCap)")
    // frequent words are SHORT, rare words LONG (Zipf brevity): the
    // top-40 ranks are one syllable, deep ranks are 3+
    assert(freq.take(5).forall(_.getString(0).length == 2))
    assert(freq.last.getString(0).length >= 6)
    // the dup-injection shape is profile-independent
    val dup = GenScale.documents(spark, 20000, openVocab = true).agg(
      (lit(1.0) - countDistinct(col("text")) / count(lit(1))).as("dup_rate"))
      .head.getDouble(0)
    assert(dup > 0.0 && dup < 0.01, s"dup rate off under open: $dup")
  }

  test("embeddings are unit-norm and lineitem keeps ~4 lines/order") {
    val e = GenScale.embeddings(spark, 300)
      .withColumn("nrm", sqrt(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))))
    val bad = e.filter(abs(col("nrm") - 1.0) > 1e-3).count()
    assert(bad == 0, s"$bad non-unit vectors")
    val l = GenScale.lineitem(spark, 3000, 2000, 100)
    val lpo = l.groupBy("l_orderkey").count()
      .agg(avg("count"), max("count")).head
    assert(math.abs(lpo.getDouble(0) - 4.02) < 0.15,
      s"lines/order drifted: ${lpo.getDouble(0)}")
    assert(lpo.getLong(1) <= 12)
  }
}
