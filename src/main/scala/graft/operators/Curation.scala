package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables

/** The end-to-end curation pipeline (capstone of SURVEY.md §2.3): one
  * keep/drop decision per document with the dominating drop reason, the
  * exact query a training-data run executes before tokenization.
  *
  * Composition, in precedence order:
  *  1. exact duplicate (non-keeper of an identical-content group)
  *  2. near-duplicate (non-keeper of a jaccard>=0.8 cluster, q55)
  *  3. contaminated (shares >=3 5-grams with the eval slice, q56)
  *  4. repetitive (top-2-gram fraction > 0.2, q57)
  *  5. low quality (composite < 0.4, q48)
  *
  * Scale shape: one window over (doc_id, md5) + four keyed left joins —
  * the flag tables carry flagged docs only, so the optimizer broadcasts
  * them when they are genuinely small and falls back to shuffled joins
  * when the drop rate makes them large. The fact table is scanned once.
  */
object Curation {

  def q58CurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    // drop the text payload BEFORE the hash window — the shuffle then
    // carries (doc_id, 32-char hash) instead of whole documents.
    // The quality composite rides the SAME projection (r17 opt): it is
    // a pure row-local expression over text (TextOps.qualityTerms), so
    // computing it here instead of left-joining TextOps.qualityScores
    // deletes one corpus scan AND one corpus×corpus doc_id join from
    // the capstone — the fused column is the identical expression, and
    // every doc has a quality value, so the dropped left join cannot
    // change any row (oracle hash-verified). Costs 8 bytes/row on the
    // hash exchange; buys a full shuffle of both corpus sides.
    val (lenTerm, punctTerm, stopTerm, mwlTerm) = TextOps.qualityTerms(col("text"))
    val base = d.select(col("doc_id"), md5(col("text")).as("content_hash"),
        (round(lenTerm + punctTerm + stopTerm + mwlTerm, 6) / 4).as("quality"))
      .withColumn("exact_keeper",
        min(col("doc_id")).over(Window.partitionBy("content_hash")))

    // The three flag tables size with the DROP RATE, not a fixed dim —
    // at 100 TB a 1% duplicate rate is 10^9 rows, past broadcast range.
    // So: fold them into ONE prioritized flag table first (cheap keyed
    // agg over only the flagged ids), then a single keyed left join
    // against the fact side; the optimizer broadcasts it when genuinely
    // small and shuffles otherwise. Precedence rides in the min(pri).
    // compose from the UNORDERED forms — the q-queries' final ORDER BYs
    // are presentation-only and would cost a global range exchange each
    // inside this plan (q55's even executes through its checkpoint)
    val flags = Dedup.dupClusters(s, dir)
      .filter(!col("is_keeper"))
      .select(col("doc_id"), lit(2).as("pri"))
      .union(Dedup.contaminationHits(s, dir)
        .select(col("doc_id"), lit(3).as("pri")))
      .union(TextOps.repetitionScores(s, dir)
        .filter(col("is_repetitive"))
        .select(col("doc_id"), lit(4).as("pri")))
      .groupBy("doc_id").agg(min(col("pri")).as("flag_pri"))

    base
      .join(flags, Seq("doc_id"), "left_outer")
      .withColumn("drop_reason",
        when(col("doc_id") =!= col("exact_keeper"), "exact_dup")
          .when(col("flag_pri") === 2, "near_dup")
          .when(col("flag_pri") === 3, "contaminated")
          .when(col("flag_pri") === 4, "repetitive")
          .when(col("quality") < 0.4, "low_quality"))
      .withColumn("keep", col("drop_reason").isNull)
      .select(col("doc_id"), col("keep"),
        coalesce(col("drop_reason"), lit("kept")).as("reason"), col("quality"))
      .orderBy("doc_id")
  }

  /** q58 instrumented with `Dataset.observe` — the 100 TB ops surface
    * for pipeline telemetry: the keep/drop tallies and the mean quality
    * of KEPT documents accumulate inside the same single pass that
    * produces the output (plain codegen'd aggregate expressions riding
    * the task metrics channel), instead of a second corpus scan or a
    * driver-side recount. The caller hands in the Observation and reads
    * `obs.get` after any action on the returned frame; at scale this is
    * how a curation run reports its yield without re-reading anything.
    * Covered by Round7OpsSpec (metrics == recomputed counts); the
    * observed frame is q58 itself, so its oracle story is unchanged.
    */
  def observedCuration(s: SparkSession, dir: String,
      obs: org.apache.spark.sql.Observation): DataFrame =
    q58CurationPipeline(s, dir).observe(obs,
      count(lit(1)).as("docs_total"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("docs_kept"),
      sum(when(!col("keep"), 1L).otherwise(0L)).as("docs_dropped"),
      avg(when(col("keep"), col("quality"))).as("kept_mean_quality"))

  val q58Sql: String =
    s"""WITH RECURSIVE
       |near AS (SELECT doc_id, TRUE AS near_dup FROM (${Dedup.q55Sql}) WHERE NOT is_keeper),
       |contam AS (SELECT DISTINCT doc_id, TRUE AS contaminated FROM (${Dedup.q56Sql})),
       |repet AS (SELECT doc_id, TRUE AS repetitive FROM (${TextOps.q57Sql}) WHERE is_repetitive),
       |qual AS (SELECT doc_id, quality FROM (${TextOps.q48Sql})),
       |base AS (
       | SELECT doc_id, MIN(doc_id) OVER (PARTITION BY MD5(text)) AS exact_keeper
       | FROM documents)
       |SELECT b.doc_id, reason = 'kept' AS keep, reason, quality FROM (
       | SELECT b.doc_id AS doc_id,
       |  CASE WHEN b.doc_id <> b.exact_keeper THEN 'exact_dup'
       |       WHEN COALESCE(n.near_dup, FALSE) THEN 'near_dup'
       |       WHEN COALESCE(c.contaminated, FALSE) THEN 'contaminated'
       |       WHEN COALESCE(r.repetitive, FALSE) THEN 'repetitive'
       |       WHEN q.quality < 0.4 THEN 'low_quality'
       |       ELSE 'kept' END AS reason,
       |  q.quality AS quality
       | FROM base b
       | LEFT JOIN near n ON b.doc_id = n.doc_id
       | LEFT JOIN contam c ON b.doc_id = c.doc_id
       | LEFT JOIN repet r ON b.doc_id = r.doc_id
       | LEFT JOIN qual q ON b.doc_id = q.doc_id) b
       |ORDER BY doc_id""".stripMargin

  // T24: token-budget shard packing — assign documents to fixed-budget
  // training shards (2048 tokens) by greedy sequential packing in a
  // deterministic order. Pure integer arithmetic: exclusive running token
  // sum per source, integer-divided by the budget. The window is keyed by
  // source — the per-key cumsum is the textbook two-phase prefix sum on a
  // cluster, never a global single-partition window.
  def q80ShardPack(s: SparkSession, dir: String): DataFrame = {
    val budget = 2048
    val d = Tables.documents(s, dir)
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    d.select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("shard", expr(s"cum_before div $budget"))
      .groupBy("source", "shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("shard_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("source", "shard")
  }

  val q80Sql: String =
    """SELECT source, shard, COUNT(*) AS n_docs,
      | CAST(SUM(n_tok) AS BIGINT) AS shard_tokens,
      | MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM (
      | SELECT source, doc_id, n_tok,
      |  CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS shard
      | FROM (
      |  SELECT source, doc_id,
      |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents))
      |GROUP BY source, shard ORDER BY source, shard""".stripMargin

  // T23: corpus mixing weights — temperature-style sampling shares per
  // (source, lang) stratum: weight ∝ sqrt(token count) (alpha = 0.5
  // upsamples low-resource strata, the multilingual-mixing standard).
  // Determinism: sqrt is IEEE-correctly-rounded in both engines; each
  // per-stratum sqrt is pinned to DECIMAL(28,10) (HALF_UP, identical both
  // sides) so the cross-strata denominator is an EXACT decimal sum —
  // order-free — and each share is then one IEEE division, rounded.
  // Scale shape: one scan + one tiny hash aggregate; the global-total
  // window runs over #strata rows (dozens), not the corpus.
  def q77MixWeights(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val strata = d
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast(LongType)).as("n_tokens"))
      .withColumn("sq",
        sqrt(col("n_tokens").cast(DoubleType)).cast(DecimalType(28, 10)))
    val wAll = Window.partitionBy()
    strata
      .withColumn("sq_total", sum(col("sq")).over(wAll))
      .withColumn("docs_total", sum(col("n_docs")).over(wAll))
      .select(
        col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        round(col("sq").cast(DoubleType) / col("sq_total").cast(DoubleType), 6)
          .as("weight_share"),
        round(col("n_docs").cast(DoubleType) / col("docs_total"), 6)
          .as("natural_share"),
        round(
          (col("sq").cast(DoubleType) / col("sq_total").cast(DoubleType)) /
            (col("n_docs").cast(DoubleType) / col("docs_total")), 6)
          .as("boost"))
      .orderBy("source", "lang")
  }

  val q77Sql: String =
    """WITH strata AS (
      |  SELECT source, lang, COUNT(*) AS n_docs,
      |   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1, 2),
      |sq AS (
      |  SELECT *, CAST(SQRT(CAST(n_tokens AS DOUBLE)) AS DECIMAL(28,10)) AS sq
      |  FROM strata)
      |SELECT source, lang, n_docs, n_tokens,
      | ROUND(CAST(sq AS DOUBLE) / CAST(SUM(sq) OVER () AS DOUBLE), 6) AS weight_share,
      | ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 6) AS natural_share,
      | ROUND((CAST(sq AS DOUBLE) / CAST(SUM(sq) OVER () AS DOUBLE))
      |  / (CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER ()), 6) AS boost
      |FROM sq ORDER BY source, lang""".stripMargin

  // T31: token-budget mixture sampler — T23's sqrt-token mixture
  // weights turned into an EXECUTABLE sampling plan: each (source,
  // lang) stratum gets a token budget proportional to its weight share
  // (a fixed fraction of the corpus here; the fraction is the only
  // free parameter at 100 TB), and docs fill the budget in a
  // deterministic pseudo-random order — md5Long(doc_id), so the
  // "random" sample is reproducible run-to-run and engine-to-engine —
  // via a keyed prefix sum (T24's machinery). Greedy fill: a doc is
  // kept while any budget remains before it, so each stratum overshoots
  // by at most one document. Scale shape: the budget table is one row
  // per stratum (global window over #strata rows only), everything else
  // is one keyed window + one broadcast-sized join — no global sort.
  val BudgetFrac = 0.25

  def q113BudgetSample(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val docs = d.select(col("doc_id"), col("source"), col("lang"),
      size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
      graft.functions.TextFunctions.md5Long(col("doc_id")).as("hkey"))
    // stratum budgets from q77's exact-decimal sqrt weighting
    val strata = docs.groupBy("source", "lang").agg(sum("n_tokens").as("tok"))
      .withColumn("sq", sqrt(col("tok").cast(DoubleType)).cast(DecimalType(28, 10)))
    val wAll = Window.partitionBy()
    val budgets = strata
      .withColumn("sq_total", sum(col("sq")).over(wAll))
      .withColumn("tok_total", sum(col("tok")).over(wAll))
      .select(col("source"), col("lang"),
        floor(lit(BudgetFrac) * col("tok_total").cast(DoubleType) *
          (col("sq").cast(DoubleType) / col("sq_total").cast(DoubleType)))
          .cast(LongType).as("budget_tokens"))
    val w = Window.partitionBy("source", "lang").orderBy("hkey", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(budgets, Seq("source", "lang"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < col("budget_tokens"))
      .select(col("doc_id"), col("source"), col("lang"), col("n_tokens"),
        col("cum_tokens"), col("budget_tokens"))
      .orderBy("doc_id")
  }

  val q113Sql: String = {
    val hkey = graft.functions.TextFunctions.md5LongSql("doc_id")
    s"""WITH docs AS (
       |  SELECT doc_id, source, lang,
       |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |   $hkey AS hkey
       |  FROM documents),
       |strata AS (
       |  SELECT source, lang, CAST(SUM(n_tokens) AS BIGINT) AS tok
       |  FROM docs GROUP BY 1, 2),
       |sq AS (
       |  SELECT *, CAST(SQRT(CAST(tok AS DOUBLE)) AS DECIMAL(28,10)) AS sq
       |  FROM strata),
       |budgets AS (
       |  SELECT source, lang,
       |   CAST(FLOOR(CAST($BudgetFrac AS DOUBLE)
       |     * CAST(SUM(tok) OVER () AS DOUBLE)
       |     * (CAST(sq AS DOUBLE) / CAST(SUM(sq) OVER () AS DOUBLE))) AS BIGINT)
       |    AS budget_tokens
       |  FROM sq),
       |cum AS (
       |  SELECT d.doc_id, d.source, d.lang, d.n_tokens, b.budget_tokens,
       |   CAST(SUM(d.n_tokens) OVER (PARTITION BY d.source, d.lang
       |     ORDER BY d.hkey, d.doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |    AS cum_tokens
       |  FROM docs d JOIN budgets b USING (source, lang))
       |SELECT doc_id, source, lang, n_tokens, cum_tokens, budget_tokens
       |FROM cum WHERE cum_tokens - n_tokens < budget_tokens
       |ORDER BY doc_id""".stripMargin
  }

  // T32: DSIR-style importance selection (Xie et al., "Data Selection
  // for Language Models via Importance Resampling", NeurIPS 2023):
  // rank raw docs by how much they look like a TARGET slice under
  // hashed n-gram bag-of-words models. Features are md5Long(token) mod
  // B buckets; the per-bucket importance log-ratio
  // ln(p_target(b)/p_raw(b)) with add-1 smoothing is quantized ONCE to
  // integer micro-nats, so every doc score is an exact long sum of
  // per-bucket constants — aggregation-order-proof and engine-exact.
  // The target here is the English slice (`lang = 'en'`), the raw pool
  // is the whole corpus. Scale shape: the bucket/log-ratio table is B
  // rows (broadcast); the token stream is a map-side explode consumed
  // twice — recomputing a narrow map is the right call at 100 TB,
  // materializing the exploded token stream is not; doc scores are one
  // keyed groupBy; top-k is TakeOrdered (no global sort).
  val DsirBuckets = 4096
  val DsirTopK = 100

  def q114DsirSelect(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val tok = d.select(col("doc_id"), col("lang"), col("source"),
        explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("b",
        graft.functions.TextFunctions.md5Long(col("token")) % DsirBuckets)
    val buckets = tok.groupBy("b").agg(
      count(lit(1)).as("r"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t"))
    val wAll = Window.partitionBy()
    val lam = buckets
      .withColumn("rTot", sum("r").over(wAll))
      .withColumn("tTot", sum("t").over(wAll))
      .select(col("b"),
        round(log(
          ((col("t") + 1).cast(DoubleType) / (col("r") + 1)) *
            ((col("rTot") + DsirBuckets).cast(DoubleType) / (col("tTot") + DsirBuckets))
        ) * 1e6, 0).cast(LongType).as("lam"))
    tok.join(broadcast(lam), Seq("b"))
      .groupBy("doc_id", "lang", "source")
      .agg(count(lit(1)).as("n_tokens"), sum("lam").as("score_micro"))
      .orderBy(desc("score_micro"), col("doc_id"))
      .limit(DsirTopK)
  }

  val q114Sql: String = {
    val h = graft.functions.TextFunctions.md5LongSql("token")
    val B = DsirBuckets
    s"""WITH tok AS (
       |  SELECT doc_id, lang, source, token, $h % $B AS b
       |  FROM (SELECT doc_id, lang, source,
       |        unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE len(token) > 0),
       |buckets AS (
       |  SELECT b, COUNT(*) AS r,
       |   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS t
       |  FROM tok GROUP BY b),
       |lam AS (
       |  SELECT b,
       |   CAST(ROUND(LN((CAST(t + 1 AS DOUBLE) / (r + 1))
       |     * (CAST(CAST(SUM(r) OVER () AS BIGINT) + $B AS DOUBLE)
       |        / (CAST(SUM(t) OVER () AS BIGINT) + $B))) * 1000000, 0) AS BIGINT)
       |    AS lam
       |  FROM buckets)
       |SELECT doc_id, lang, source, COUNT(*) AS n_tokens,
       | CAST(SUM(lam) AS BIGINT) AS score_micro
       |FROM tok JOIN lam USING (b)
       |GROUP BY 1, 2, 3
       |ORDER BY score_micro DESC, doc_id
       |LIMIT $DsirTopK""".stripMargin
  }

  // T34: canonical-document selection — the RETENTION half of near-dup
  // dedup. q55 resolves pairs into clusters and keeps the min-id member;
  // production curation keeps the BEST member (SemDeDup, RefinedWeb both
  // retain by quality, not by arrival order). This joins q55's clusters
  // with q48's composite quality and picks, per cluster, the max-quality
  // member (doc_id as the deterministic tiebreak), reporting it against
  // the naive min-id keeper so the upgrade is inspectable.
  // Scale shape: the cluster table sizes with the DUP RATE, not the
  // corpus; the quality join is keyed by doc_id; both row_numbers share
  // one (cluster_id) partitioning, so the window stage is a single
  // shuffle of (cluster_id, doc_id, quality) triples — near-dup clusters
  // are small cliques, so no partition skew.
  def q118CanonicalSelect(s: SparkSession, dir: String): DataFrame = {
    val clusters = Dedup.dupClusters(s, dir).select("cluster_id", "doc_id")
    val quality = TextOps.qualityScores(s, dir).select("doc_id", "quality")
    val members = clusters.join(quality, Seq("doc_id"))
    val byQuality = Window.partitionBy("cluster_id")
      .orderBy(desc("quality"), asc("doc_id"))
    val byId = Window.partitionBy("cluster_id").orderBy(asc("doc_id"))
    members
      .withColumn("rk", row_number().over(byQuality))
      .withColumn("rk2", row_number().over(byId))
      .groupBy("cluster_id")
      .agg(
        count(lit(1)).as("n_members"),
        max(when(col("rk") === 1, col("doc_id"))).as("kept_doc"),
        max(when(col("rk") === 1, col("quality"))).as("kept_quality"),
        max(when(col("rk2") === 1, col("doc_id"))).as("minid_doc"),
        max(when(col("rk2") === 1, col("quality"))).as("minid_quality"))
      .withColumn("upgraded", col("kept_doc") =!= col("minid_doc"))
      .withColumn("quality_gain",
        round(col("kept_quality") - col("minid_quality"), 6))
      .orderBy("cluster_id")
  }

  val q118Sql: String =
    s"""WITH clusters AS (${Dedup.q55Sql}),
       |quality AS (SELECT doc_id, quality FROM (${TextOps.q48Sql})),
       |m AS (
       | SELECT c.cluster_id, c.doc_id, q.quality,
       |  ROW_NUMBER() OVER (PARTITION BY c.cluster_id
       |    ORDER BY q.quality DESC, c.doc_id) AS rk,
       |  ROW_NUMBER() OVER (PARTITION BY c.cluster_id
       |    ORDER BY c.doc_id) AS rk2
       | FROM clusters c JOIN quality q USING (doc_id))
       |SELECT cluster_id, COUNT(*) AS n_members,
       | MAX(CASE WHEN rk = 1 THEN doc_id END) AS kept_doc,
       | MAX(CASE WHEN rk = 1 THEN quality END) AS kept_quality,
       | MAX(CASE WHEN rk2 = 1 THEN doc_id END) AS minid_doc,
       | MAX(CASE WHEN rk2 = 1 THEN quality END) AS minid_quality,
       | MAX(CASE WHEN rk = 1 THEN doc_id END)
       |   <> MAX(CASE WHEN rk2 = 1 THEN doc_id END) AS upgraded,
       | ROUND(MAX(CASE WHEN rk = 1 THEN quality END)
       |   - MAX(CASE WHEN rk2 = 1 THEN quality END), 6) AS quality_gain
       |FROM m GROUP BY cluster_id ORDER BY cluster_id""".stripMargin

  // T38: deterministic WEIGHTED sampling without replacement
  // (Efraimidis-Spirakis priority sampling) — the curation step that
  // samples documents PROPORTIONAL TO QUALITY instead of uniformly
  // (q18/q38 are the uniform forms). Each doc gets priority
  // u^(1/w) for u ~ Uniform(0,1]; the top-k priorities are exactly a
  // weighted sample without replacement. Spark-first determinism: u is
  // the md5 hash-uniform (q18's rule — no RNG, stable under
  // partitioning, retries, and engines), compared in log space
  // (ln(u)/w, monotone in u^(1/w)) with the q53-precedent round(6) so
  // Spark and DuckDB agree bitwise; doc_id breaks ties.
  // Scale shape: priority is a pure map-side projection; top-k =
  // orderBy+limit = TakeOrderedAndProject (k-bounded per partition, no
  // global sort) — the whole operator is one scan and one k-row reduce.
  val WsK = 100

  def q124WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val q = TextOps.qualityScores(s, dir).select("doc_id", "quality")
    // strictly positive weight; quality lives in [0,1]
    val w = col("quality") + lit(0.1)
    // 60-bit md5 prefix → u in (0, 1]: (bits+1) / 2^60
    val u = (graft.functions.TextFunctions.md5Long(col("doc_id")) + lit(1L))
      .cast(DoubleType) / lit(1152921504606846976.0)
    q.withColumn("priority", round(log(u) / w, 6))
      .orderBy(desc("priority"), asc("doc_id"))
      .limit(WsK)
      .select(col("doc_id"), col("quality"), col("priority"))
  }

  val q124Sql: String = {
    // +1 in LONG space, cast after — matching the Spark side exactly
    // (above 2^53 "cast then +1" and "+1 then cast" can differ one ulp)
    val u = s"CAST(${graft.functions.TextFunctions.md5LongSql("doc_id")} + 1 AS DOUBLE) / 1152921504606846976.0"
    s"""WITH q AS (SELECT doc_id, quality FROM (${TextOps.q48Sql}))
       |SELECT doc_id, quality,
       | ROUND(LN($u) / (quality + 0.1), 6) AS priority
       |FROM q
       |ORDER BY priority DESC, doc_id
       |LIMIT $WsK""".stripMargin
  }

  // T40: per-source quality CALIBRATION — raw quality scores are not
  // comparable across sources (a median web page and a median academic
  // page score differently), so mixing pipelines normalize each doc's
  // quality to its within-source quantile before applying one global
  // threshold. One keyed window per source (percent_rank with doc_id
  // tiebreak → total order → engine-identical ranks); the calibrated
  // keep flag then applies a single cross-source cutoff. Scale shape:
  // one hash exchange on source + per-partition sort — the same cost
  // class as q11; no global window, no second scan.
  val CalibrateKeep = 0.25 // drop the worst quartile of each source

  def q126QualityCalibrate(s: SparkSession, dir: String): DataFrame = {
    val q = TextOps.qualityScores(s, dir).select("doc_id", "quality")
    val d = Tables.documents(s, dir).select("doc_id", "source")
    val w = Window.partitionBy("source").orderBy("quality", "doc_id")
    q.join(d, Seq("doc_id"))
      .withColumn("q_pct", round(percent_rank().over(w), 6))
      .withColumn("keep_calibrated", col("q_pct") >= CalibrateKeep)
      .select(col("doc_id"), col("source"), col("quality"),
        col("q_pct"), col("keep_calibrated"))
      .orderBy("doc_id")
  }

  // T41: the CORPUS DATASHEET — the per-source one-page summary every
  // training-data release ships (datasheets-for-datasets shape): volume
  // (docs, whitespace tokens, median doc length), exact-dup rate
  // (1 - distinct md5 / docs), language mix (share of the dominant
  // corpus language), and mean quality. Determinism: quality has ≤6
  // decimals by construction (q48), so the mean sums exact micro-units
  // as BIGINT and divides once — aggregation order cannot perturb it;
  // dup/lang shares are integer-ratio divisions. Scale shape: one scan,
  // one groupBy(source) with partial aggregation; the quality join is
  // keyed by doc_id. The heavy member is count(DISTINCT md5) — at
  // 100 TB swap in q115's portable HLL for the same column if a 2%
  // estimate is acceptable; the exact form is kept here because the
  // datasheet is a release artifact.
  def q127CorpusDatasheet(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val q = TextOps.qualityScores(s, dir).select("doc_id", "quality")
    val per = d.join(q, Seq("doc_id"))
      .select(col("source"), col("lang"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
        md5(col("text")).as("h"),
        round(col("quality") * lit(1000000)).cast(LongType).as("q_micro"))
    per.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        round(expr("percentile(n_tokens, 0.5)"), 4).as("p50_tokens"),
        round((count(lit(1)) - countDistinct(col("h"))).cast(DoubleType) /
          count(lit(1)), 6).as("dup_rate"),
        round(sum(when(col("lang") === "en", 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1)), 6).as("pct_en"),
        round(sum(col("q_micro")).cast(DoubleType) / lit(1e6) /
          count(lit(1)), 6).as("mean_quality"))
      .orderBy("source")
  }

  val q127Sql: String =
    s"""WITH q AS (SELECT doc_id, quality FROM (${TextOps.q48Sql})),
       |per AS (
       | SELECT d.source, d.lang,
       |  len(string_split(d.text, ' ')) AS n_tokens,
       |  md5(d.text) AS h,
       |  CAST(ROUND(q.quality * 1000000) AS BIGINT) AS q_micro
       | FROM documents d JOIN q USING (doc_id))
       |SELECT source,
       | COUNT(*) AS n_docs,
       | CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       | ROUND(QUANTILE_CONT(n_tokens, 0.5), 4) AS p50_tokens,
       | ROUND(CAST(COUNT(*) - COUNT(DISTINCT h) AS DOUBLE) / COUNT(*), 6) AS dup_rate,
       | ROUND(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS pct_en,
       | ROUND(CAST(SUM(q_micro) AS DOUBLE) / 1000000 / COUNT(*), 6) AS mean_quality
       |FROM per GROUP BY source ORDER BY source""".stripMargin

  // the keep flag compares the ROUNDED pct on both engines (comparing
  // raw on one side could flip docs sitting exactly at the boundary)
  val q126Sql: String =
    s"""WITH q AS (SELECT doc_id, quality FROM (${TextOps.q48Sql})),
       |m AS (
       | SELECT d.doc_id, d.source, q.quality,
       |  ROUND(PERCENT_RANK() OVER (PARTITION BY d.source
       |    ORDER BY q.quality, d.doc_id), 6) AS q_pct
       | FROM q JOIN documents d USING (doc_id))
       |SELECT doc_id, source, quality, q_pct,
       | q_pct >= $CalibrateKeep AS keep_calibrated
       |FROM m ORDER BY doc_id""".stripMargin
}
