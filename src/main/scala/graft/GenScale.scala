package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic scale-up generator for the soak bench (round-9 verdict
  * item 6: "extend the measured-scaling table one decade").
  *
  * The driver's testdata stops at sf0.1; measuring how the heavy queries
  * scale needs a decade more data with the SAME distributional shape:
  * per-row duplicate density, words-per-doc, lines-per-order, users-per-
  * event-volume all held constant so row count is the only axis that
  * moves. Everything here is derived from xxhash64 of the row id — no
  * RNG object, no driver loop, no order dependence — so the same (dir,
  * sf) pair regenerates bit-identically on any partitioning, and
  * generation itself is a distributed job (spark.range → project →
  * write), the only shape that would also work at 100 TB.
  *
  * Fidelity targets measured off /root/testdata/sf0.1 (seed-42 driver
  * data): documents 5 000/sf0.1 (31-word vocab, 10-100 words/doc,
  * lang en 41%/zh·es·fr·de ~15%, 20 uniform sources, ~0.2% exact-dup
  * copies + ~2% one-to-three-word near-copies, bounded back-reference
  * window so dup-cluster size stays O(1)); embeddings 2 000/sf0.1
  * (64-dim unit vectors, isotropic Box-Muller gaussian, 10 uniform
  * labels); events 100 000/sf0.1 (1 500 users/sf0.1, 5 uniform types,
  * 30-day micros timestamps, value ~ Exp(mean 50) rounded to cents);
  * lineitem 600 000/sf0.1 (orders with Poisson(4)-clipped-[1,17] lines,
  * uniform price 900..105 000, N/R/A flags — the columns q103's
  * OCR-clean/bisection chain keys on).
  *
  * NOT a replacement for the driver's oracle data: the soak benches the
  * same generator at two scales (gen-sf0.1 vs gen-sf1) so the ratio is a
  * pure scaling exponent, and gen-sf0.1 timings are sanity-checked
  * against the real-sf0.1 bench to confirm the workload shape matches.
  */
object GenScale {

  private val Vocab: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  /** xxhash64 with a string salt; pmod keeps it in [0, n). */
  private def roll(salt: String, n: Long, cols: Column*): Column =
    pmod(xxhash64((lit(salt) +: cols): _*), lit(n))

  /** Uniform in (0, 1] at 1e-6 resolution — safe inside ln(). */
  private def unif(salt: String, cols: Column*): Column =
    (roll(salt, 1000000L, cols: _*) + lit(1L)) / lit(1000000.0)

  /** Heaps-law vocabulary size for the opt-in v2 profile: V ∝ √corpus,
    * anchored so V(5 000 docs) = 31 — gen2-sf0.1 is therefore
    * bit-identical to the v1 anchor scale, and larger scales grow
    * vocabulary the way a real corpus does (so the shingle df
    * distribution, and with it the near-dup candidate workload, stays
    * stable instead of collapsing against the posting-list df cap —
    * the gen-sf3 boundary BENCH_R10_SF1.json records).
    */
  private[graft] def heapsV(nDocs: Long): Int =
    math.max(31, math.round(31.0 * math.sqrt(nDocs / 5000.0)).toInt)

  // --- open-vocabulary profile (r17, r16 verdict next-round #2) ---------
  // The heaps profile grows DISTINCT-word count correctly but its words
  // are "tokN" literals from a driver-side array — ~980 distinct words
  // at 5M docs, so BPE merge space exhausts around 1k merges and the
  // 32k-depth trainer claim rested on a synthetic side table. The open
  // profile makes the corpus text itself production-shaped:
  //   - vocabulary size follows Heaps' law on the TOKEN count
  //     (V = 44·sqrt(tokens): ~730k distinct words at the 5M-doc rung,
  //     ~73k at gen-sf1 — real-web scale);
  //   - word FREQUENCY is Zipf(1) via inverse-CDF on a row-local hash
  //     (rank = floor((V+1)^u) — log-uniform == p(r) ∝ 1/r);
  //   - words are SUBWORD-COMPOSITIONAL: rank rendered in base-40
  //     consonant-vowel syllables, most significant digit first, no
  //     leading zeros — frequent words are short, rare words long
  //     (the Zipf-brevity shape), and BPE has genuine sub-word
  //     structure to learn at 32k+ merges.
  // Everything stays a pure function of the row hash — no driver-side
  // vocabulary array (an open vocabulary cannot ride in a literal), so
  // generation is distributed and bit-identical on any partitioning.

  private val SylCons = Seq("b", "d", "g", "k", "l", "m", "n", "p", "r", "s")
  private val SylVows = Seq("a", "e", "i", "o")
  private val Syllables: Seq[String] =
    for (c <- SylCons; v <- SylVows) yield c + v // 40
  private val SylBase = Syllables.size

  /** Heaps vocabulary for the open profile, on corpus token count
    * (mean 55 words/doc): V = 44·sqrt(tokens), the classic web-corpus
    * constants (K≈44, β≈0.5).
    */
  private[graft] def openV(nDocs: Long): Int =
    math.max(1000, math.round(44.0 * math.sqrt(nDocs * 55.0)).toInt)

  /** rank (1-based) → syllable word, base-40 digits MSD-first. */
  private def sylWord(rank: Column, v: Int): Column = {
    val syl = array(Syllables.map(lit): _*)
    val maxDigits = // smallest d with 40^d > V
      Iterator.iterate(1L)(_ * SylBase).zipWithIndex
        .find(_._1 > v).map(_._2).getOrElse(4).max(1)
    concat((maxDigits - 1 to 0 by -1).map { i =>
      val p = math.pow(SylBase, i).toLong
      val digit = ((rank / lit(p)).cast(LongType) % SylBase + 1).cast(IntegerType)
      when(rank >= p || lit(i == 0), element_at(syl, digit)).otherwise(lit(""))
    }: _*)
  }

  /** Zipf(1) rank in [1, v] from a row-local hash cell. */
  private def zipfRank(salt: String, v: Int, cell: Column): Column =
    least(greatest(
      floor(pow(lit(v + 1.0), unif(salt, cell))).cast(LongType), lit(1L)), lit(v.toLong))

  def documents(s: SparkSession, nDocs: Long,
      heapsVocab: Boolean = false, openVocab: Boolean = false): DataFrame = {
    require(!(heapsVocab && openVocab), "pick one documents profile")
    val v: Int =
      if (openVocab) openV(nDocs)
      else if (heapsVocab) heapsV(nDocs) else Vocab.size
    val vocabWords: Seq[String] =
      if (openVocab) Nil
      else Vocab ++ (Vocab.size until v).map(i => s"tok$i")
    val vocab = if (openVocab) lit(null) else array(vocabWords.map(lit): _*)
    def wordAt(salt: String, cell: Column): Column =
      if (openVocab) sylWord(zipfRank(salt, v, cell), v)
      else element_at(vocab,
        (roll(salt, v.toLong, cell) + lit(1L)).cast(IntegerType))
    val base = s.range(nDocs).toDF("doc_id")
      // duplicate injection, all row-local: a copy doc derives its text
      // from a CONTENT id pointing ≤50 ids back, so the base doc's text
      // (a pure function of content id) is reproduced without any
      // cross-row reference. 0.2% exact copies + 2% near copies with
      // 1-3 single-word edits — the per-capita rates that make q40/q41/
      // q42/q55/q111 pair counts scale linearly with corpus size.
      .withColumn("dup_roll", roll("dup", 1000L, col("doc_id")))
      .withColumn("content_id",
        when(col("dup_roll") < 22,
          greatest(lit(0L), col("doc_id") - lit(1L) - roll("off", 50L, col("doc_id"))))
          .otherwise(col("doc_id")))
      .withColumn("n_edits",
        when(col("dup_roll") < 2, lit(0))                   // exact copy
          .when(col("dup_roll") < 22, lit(1) + roll("ne", 3L, col("doc_id")).cast(IntegerType))
          .otherwise(lit(0)))
    val wc = (lit(10L) + roll("wc", 91L, col("content_id"))).cast(IntegerType)
    val words = transform(
      sequence(lit(1), col("n_words")),
      i => wordAt("w", col("content_id") * 131 + i.cast(LongType)))
    // near-copy edit: overwrite up to 3 hash-chosen positions with a
    // hash-chosen replacement word (edit distance 1-3 → token-3-gram
    // Jaccard ~0.85-0.95 on a 54-word doc, squarely in the near-dup band)
    val edited = transform(
      col("words_raw"),
      (w, p) => {
        val hit = (0 until 3).map { e =>
          col("n_edits") > e &&
            p === roll(s"pos$e", 1000L, col("doc_id")).cast(IntegerType) % size(col("words_raw"))
        }.reduce(_ || _)
        when(hit, wordAt("mw", col("doc_id") * 7 + p.cast(LongType)))
          .otherwise(w)
      })
    val langRoll = roll("lang", 100L, col("doc_id"))
    base
      .withColumn("n_words", wc)
      .withColumn("words_raw", words)
      .withColumn("text", array_join(edited, " "))
      .withColumn("lang",
        when(langRoll < 41, "en").when(langRoll < 56, "zh")
          .when(langRoll < 71, "es").when(langRoll < 86, "fr").otherwise("de"))
      .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(20L))))
      .withColumn("n_chars", length(col("text")).cast(LongType))
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  def embeddings(s: SparkSession, nVecs: Long): DataFrame = {
    // isotropic 64-dim gaussian via Box-Muller on two hash-uniforms,
    // then L2-normalized — matches the measured driver embeddings
    // (unit norm, comp std 1/8, zero cluster structure, 10 uniform labels)
    val raw = transform(sequence(lit(0), lit(63)), j => {
      val cell = col("vec_id") * 64 + j.cast(LongType)
      sqrt(lit(-2.0) * log(unif("u1", cell))) *
        cos(lit(2.0 * math.Pi) * unif("u2", cell))
    })
    s.range(nVecs).toDF("vec_id")
      .withColumn("g", raw)
      .withColumn("nrm", sqrt(aggregate(col("g"), lit(0.0), (acc, x) => acc + x * x)))
      .withColumn("embedding",
        transform(col("g"), x => (x / col("nrm")).cast(FloatType)))
      .withColumn("label", roll("lab", 10L, col("vec_id")).cast(IntegerType))
      .select("vec_id", "embedding", "label")
  }

  def events(s: SparkSession, nEvents: Long, nUsers: Long): DataFrame = {
    // 30 days of micros-precision timestamps from 2024-01-01, ~67
    // events/user at every scale (users grow with volume), Exp(50) values
    val epochBase = java.time.LocalDate.of(2024, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    s.range(nEvents).toDF("event_id")
      .withColumn("ts", timestamp_micros(
        lit(epochBase * 1000000L) +
          roll("sec", 30L * 24 * 3600, col("event_id")) * 1000000L +
          roll("us", 1000000L, col("event_id"))))
      .withColumn("user_id", roll("u", nUsers, col("event_id")))
      .withColumn("event_type", element_at(
        array(lit("signup"), lit("purchase"), lit("view"), lit("click"), lit("error")),
        (roll("et", 5L, col("event_id")) + 1L).cast(IntegerType)))
      .withColumn("value", round(lit(-50.0) * log(unif("v", col("event_id"))), 2))
      .withColumn("props", concat(lit("{\"k\": "), roll("k", 100L, col("event_id")), lit("}")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  def lineitem(s: SparkSession, nOrders: Long, nParts: Long, nSupp: Long): DataFrame = {
    // lines-per-order: inverse-CDF of Poisson(4) with the zero class
    // folded into 1 and the tail clipped at 12 — mean 4.02 / std 1.93 vs
    // the driver's 4.08 / 1.94; close enough that q103's per-sheet
    // window work per row is scale-invariant
    val r = roll("nl", 1000L, col("l_orderkey"))
    val nLines =
      when(r < 92, 1).when(r < 238, 2).when(r < 433, 3).when(r < 629, 4)
        .when(r < 785, 5).when(r < 889, 6).when(r < 949, 7).when(r < 979, 8)
        .when(r < 992, 9).when(r < 997, 10).when(r < 999, 11).otherwise(12)
    val lkey = col("l_orderkey") * 31 + col("l_linenumber").cast(LongType)
    s.range(nOrders).toDF("l_orderkey")
      .withColumn("l_linenumber", explode(sequence(lit(1), nLines)))
      .withColumn("l_partkey", roll("p", nParts, lkey))
      .withColumn("l_suppkey", roll("s", nSupp, lkey))
      .withColumn("l_quantity", (roll("q", 50L, lkey) + 1L).cast(DoubleType))
      .withColumn("l_extendedprice",
        round(lit(900.0) + unif("pr", lkey) * lit(104100.0), 2))
      .withColumn("l_discount", roll("d", 11L, lkey).cast(DoubleType) / 100.0)
      .withColumn("l_tax", roll("t", 9L, lkey).cast(DoubleType) / 100.0)
      .withColumn("l_returnflag", element_at(
        array(lit("N"), lit("R"), lit("A")), (roll("rf", 3L, lkey) + 1L).cast(IntegerType)))
      .withColumn("l_linestatus", element_at(
        array(lit("F"), lit("O")), (roll("ls", 2L, lkey) + 1L).cast(IntegerType)))
      .withColumn("l_shipdate",
        date_add(to_date(lit("1995-01-01")), roll("sd", 2500L, lkey).cast(IntegerType))
          .cast(TimestampType))
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
  }

  def orders(s: SparkSession, nOrders: Long, nCust: Long): DataFrame =
    s.range(nOrders).toDF("o_orderkey")
      .withColumn("o_custkey", roll("c", nCust, col("o_orderkey")))
      .withColumn("o_orderstatus", element_at(
        array(lit("P"), lit("O"), lit("F")), (roll("os", 3L, col("o_orderkey")) + 1L).cast(IntegerType)))
      .withColumn("o_totalprice",
        round(lit(1000.0) + unif("ot", col("o_orderkey")) * lit(499000.0), 2))
      .withColumn("o_orderdate",
        date_add(to_date(lit("1995-01-01")), roll("od", 2400L, col("o_orderkey")).cast(IntegerType))
          .cast(TimestampType))
      .withColumn("o_orderpriority", element_at(
        array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"), lit("4-NOT SPECIFIED"), lit("5-LOW")),
        (roll("op", 5L, col("o_orderkey")) + 1L).cast(IntegerType)))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")

  // --- dimension tables (round 10: the FULL registry sweeps at 10×,
  // so every table the 132 queries read must exist at generated scale;
  // schemas and value domains match the driver sf0.1 parquet) ---------

  def customer(s: SparkSession, nCust: Long): DataFrame =
    s.range(nCust).toDF("c_custkey")
      .withColumn("c_name",
        concat(lit("Customer#"), lpad(col("c_custkey").cast(StringType), 9, "0")))
      .withColumn("c_nationkey", roll("cn", 25L, col("c_custkey")).cast(IntegerType))
      .withColumn("c_acctbal",
        round(lit(-1000.0) + unif("cb", col("c_custkey")) * lit(11000.0), 2))
      .withColumn("c_mktsegment", element_at(
        array(lit("AUTOMOBILE"), lit("BUILDING"), lit("FURNITURE"),
          lit("HOUSEHOLD"), lit("MACHINERY")),
        (roll("cs", 5L, col("c_custkey")) + 1L).cast(IntegerType)))
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  def supplier(s: SparkSession, nSupp: Long): DataFrame =
    s.range(nSupp).toDF("s_suppkey")
      .withColumn("s_name",
        concat(lit("Supplier#"), lpad(col("s_suppkey").cast(StringType), 9, "0")))
      .withColumn("s_nationkey", roll("sn", 25L, col("s_suppkey")).cast(IntegerType))
      .withColumn("s_acctbal",
        round(lit(-1000.0) + unif("sb", col("s_suppkey")) * lit(11000.0), 2))
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")

  def part(s: SparkSession, nParts: Long): DataFrame = {
    val adjs = array(Seq("large", "hot", "blue", "old", "small", "red",
      "green", "new", "cold", "dark").map(lit): _*)
    val nouns = array(Seq("ring", "bolt", "plate", "wheel", "gear", "pin",
      "cap", "rod", "tube", "disk").map(lit): _*)
    s.range(nParts).toDF("p_partkey")
      .withColumn("p_name", concat(
        element_at(adjs, (roll("pa", 10L, col("p_partkey")) + 1L).cast(IntegerType)),
        lit(" "),
        element_at(nouns, (roll("pn", 10L, col("p_partkey")) + 1L).cast(IntegerType))))
      .withColumn("p_brand",
        concat(lit("Brand#"), (roll("pb", 25L, col("p_partkey")) + 1L)))
      .withColumn("p_type", element_at(
        array(lit("ECONOMY"), lit("LARGE"), lit("MEDIUM"), lit("PROMO"),
          lit("SMALL"), lit("STANDARD")),
        (roll("pt", 6L, col("p_partkey")) + 1L).cast(IntegerType)))
      .withColumn("p_size", (roll("ps", 50L, col("p_partkey")) + 1L).cast(IntegerType))
      .withColumn("p_retailprice",
        round(lit(900.0) + pmod(col("p_partkey"), lit(1000L)) / 10.0, 1))
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
  }

  def region(s: SparkSession): DataFrame =
    s.range(5).toDF("r_regionkey")
      .select(col("r_regionkey").cast(IntegerType).as("r_regionkey"),
        element_at(array(lit("AFRICA"), lit("AMERICA"), lit("ASIA"),
          lit("EUROPE"), lit("MIDDLE EAST")),
          (col("r_regionkey") + 1).cast(IntegerType)).as("r_name"))

  def nation(s: SparkSession): DataFrame =
    s.range(25).toDF("n_nationkey")
      .select(col("n_nationkey").cast(IntegerType).as("n_nationkey"),
        concat(lit("NATION_"), col("n_nationkey")).as("n_name"),
        pmod(col("n_nationkey"), lit(5)).cast(IntegerType).as("n_regionkey"))

  /** args: outDir sf [heaps|v1] — e.g. `runMain graft.GenScale
    * target/gen/sf1 1.0`. The Heaps-law vocabulary profile is the
    * DEFAULT (round-11: the fixed 31-word v1 vocab collapses the
    * shingle df distribution against the posting-list cap at 30× —
    * the gen-sf3 boundary BENCH_R10_SF1.json records — so every soak
    * should measure the realistic profile unless it explicitly asks
    * for the legacy one with `v1`). At the 5 000-doc anchor scale the
    * two profiles are bit-identical (GenScaleSpec), so existing
    * cross-scale series keep their anchor point.
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2 && args.length <= 4,
      "usage: GenScale <outDir> <sf> [heaps|v1|open] [table,table,...]")
    val outDir = args(0)
    val sf = args(1).toDouble
    require(args.length == 2 || Seq("heaps", "v1", "open").contains(args(2)),
      s"unknown documents profile '${args(2)}' (expected heaps, v1 or open)")
    val heaps = args.length == 2 || args(2) == "heaps"
    val open = args.length > 2 && args(2) == "open"
    // optional table filter for deep-ladder rungs where one operator's
    // input suffices (e.g. an sf100 embeddings-only rung for q109/q139
    // — writing 100x of nine unused tables would cost ~20 GB for
    // nothing). Per-table output is a pure function of (sf, profile),
    // so a filtered dir's tables are bit-identical to a full dir's.
    val wanted: Option[Set[String]] =
      if (args.length == 4) Some(args(3).split(",").map(_.trim).toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val s = GraftSession(s"local[$cpus]", cpus)
    def n(perSf1: Long): Long = math.max(1L, math.round(perSf1 * sf))
    val tables: Seq[(String, DataFrame)] = Seq(
      "documents" -> documents(s, n(50000L), heaps, open),
      "embeddings" -> embeddings(s, n(20000L)),
      "events" -> events(s, n(1000000L), n(15000L)),
      "lineitem" -> lineitem(s, n(1500000L), n(200000L), n(10000L)),
      "orders" -> orders(s, n(1500000L), n(150000L)),
      "customer" -> customer(s, n(150000L)),
      "supplier" -> supplier(s, n(10000L)),
      "part" -> part(s, n(200000L)),
      "region" -> region(s),
      "nation" -> nation(s))
    wanted.foreach(w => w.diff(tables.map(_._1).toSet).foreach(t =>
      sys.error(s"[gen] unknown table in filter: $t")))
    tables.filter { case (name, _) => wanted.forall(_.contains(name)) }
      .foreach { case (name, df) =>
      // a handful of files per table so downstream scans start parallel
      // (the real sf0.1 data is one file; q103 pins its own repartition
      // precisely so input layout can't serialize it — keep that story
      // honest by not over-splitting here either)
      val parts = math.max(1, math.min(32, (sf * 8).toInt))
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      System.err.println(s"[gen] wrote $name sf=$sf")
    }
    s.stop()
  }
}
