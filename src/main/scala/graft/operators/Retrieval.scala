package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Hybrid retrieval (SURVEY §2.3 T50/T51): the production search shape
  * next to ANN — a lexical BM25 ranker over the documents corpus and
  * reciprocal-rank fusion of the lexical and semantic (q45 cosine)
  * rank lists. RAG data pipelines ship exactly this pair: dense
  * retrieval recalls paraphrases, lexical retrieval recalls exact
  * terms/rare ids, RRF fuses them rank-space-only (no score
  * calibration across retrievers needed — Cormack, Clarke & Büttcher,
  * SIGIR 2009).
  *
  * Determinism discipline: every per-(query, doc, term) BM25 term
  * score is quantized ONCE to integer micro-units
  * (round(idf·tfn·1e6) as BIGINT — the q110 micro-nat trick; the
  * ≤1-ulp cross-engine ln() difference is absorbed by the round), so
  * per-doc scores are exact long sums no matter the aggregation order,
  * and rankings tie-break on doc_id. RRF contributions are
  * round(1e6/(60+rank)) — pure integer-valued doubles, no FP hazard.
  */
object Retrieval {

  val K1 = 1.2 // BM25 term-frequency saturation
  val B = 0.75 // BM25 length normalization
  val NumQueries = 10 // query set: doc_id < NumQueries (the T6 convention)
  val QueryTerms = 4 // first distinct words of the query doc, in order
  val TopK = 10
  val RrfK = 60 // Cormack et al.'s constant

  /** T50: BM25 (Okapi) lexical retrieval. Queries are the first
    * `QueryTerms` distinct words (by first appearance) of each query
    * doc — deterministic and oracle-replayable.
    *
    * Scale shape: dl/avgdl are INDEX-BUILD stats (one keyed count over
    * the token explode — computed once and stored at 100 TB, like the
    * published PQ index). The query-time path prunes the posting
    * explode map-side with a broadcast semi join on the (tiny) query
    * vocabulary before any shuffle, so the tf aggregate and the
    * scoring join move only candidate postings — the inverted-index
    * access pattern, not a corpus re-scan per query.
    */
  def q148Bm25(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val toks = d.select(col("doc_id"),
      posexplode(split(lower(col("text")), " ")).as(Seq("pos", "term")))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast(DoubleType) / col("n_docs"))
      .select("n_docs", "avgdl")
    // query terms: first appearance order, term tiebreak (a doc with
    // two new words at one position is impossible, but total order is
    // the house rule)
    val wq = Window.partitionBy("query_id").orderBy(asc("fpos"), asc("term"))
    val qterms = toks.filter(col("doc_id") < NumQueries)
      .groupBy(col("doc_id").as("query_id"), col("term"))
      .agg(min("pos").as("fpos"))
      .withColumn("qrk", row_number().over(wq))
      .filter(col("qrk") <= QueryTerms)
      .select("query_id", "term")
    // map-side posting prune: only query-vocabulary terms survive the
    // explode, so the tf shuffle carries candidates only
    val tf = toks.join(broadcast(qterms.select("term").distinct()), Seq("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df over the pruned postings = the full-corpus df of a query term
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(qterms), Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .join(broadcast(df), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(
        (col("n_docs").cast(DoubleType) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("tfn",
        col("tf").cast(DoubleType) * lit(K1 + 1.0) /
          (col("tf") + lit(K1) *
            (lit(1.0) - lit(B) + lit(B) * col("dl") / col("avgdl"))))
      .withColumn("s_u", round(col("idf") * col("tfn") * lit(1e6), 0).cast(LongType))
    val w = Window.partitionBy("query_id").orderBy(desc("score_u"), asc("doc_id"))
    scored.groupBy("query_id", "doc_id")
      .agg(sum("s_u").as("score_u"), count(lit(1)).as("n_terms"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= TopK)
      .select("query_id", "rk", "doc_id", "score_u", "n_terms")
      .orderBy("query_id", "rk")
  }

  val q148Sql: String = {
    val k1 = "CAST(1.2 AS DOUBLE)"
    val k1p1 = "(CAST(1.2 AS DOUBLE) + 1.0)"
    val b = "CAST(0.75 AS DOUBLE)"
    s"""WITH toks AS MATERIALIZED (
       | SELECT doc_id, i - 1 AS pos, t[i] AS term
       | FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
       |  UNNEST(range(1, len(t) + 1)) AS u(i)
       |), dl AS MATERIALIZED (
       | SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
       |), stats AS (
       | SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl
       |), qterms AS MATERIALIZED (
       | SELECT query_id, term FROM (
       |  SELECT doc_id AS query_id, term, MIN(pos) AS fpos,
       |   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY MIN(pos) ASC, term ASC) AS qrk
       |  FROM toks WHERE doc_id < $NumQueries GROUP BY doc_id, term)
       | WHERE qrk <= $QueryTerms
       |), tf AS MATERIALIZED (
       | SELECT doc_id, term, COUNT(*) AS tf FROM toks
       | WHERE term IN (SELECT DISTINCT term FROM qterms)
       | GROUP BY doc_id, term
       |), df AS (
       | SELECT term, COUNT(*) AS df FROM tf GROUP BY term
       |), scored AS (
       | SELECT q.query_id, t.doc_id,
       |  CAST(ROUND(
       |   LN((CAST(s.n_docs AS DOUBLE) - f.df + 0.5) / (f.df + 0.5) + 1.0) *
       |   (CAST(t.tf AS DOUBLE) * $k1p1 /
       |    (t.tf + $k1 * (1.0 - $b + $b * d.dl / s.avgdl))) * 1000000.0, 0) AS BIGINT) AS s_u
       | FROM tf t
       | JOIN qterms q ON q.term = t.term AND t.doc_id <> q.query_id
       | JOIN df f ON f.term = t.term
       | JOIN dl d ON d.doc_id = t.doc_id
       | CROSS JOIN stats s
       |), agg AS (
       | SELECT query_id, doc_id, CAST(SUM(s_u) AS BIGINT) AS score_u,
       |  COUNT(*) AS n_terms,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY SUM(s_u) DESC, doc_id ASC) AS rk
       | FROM scored GROUP BY query_id, doc_id
       |)
       |SELECT query_id, rk, doc_id, score_u, n_terms FROM agg
       |WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin
  }

  /** The published inverted index (T50's serving artifact): full
    * postings + per-term df + per-doc lengths + the two corpus
    * scalars. At 100 TB the postings land TERM-BUCKETED (S17's
    * bucketBy surface) so a query's candidate read is co-located;
    * here they publish as plain parquet and the query-time prune stays
    * the broadcast semi join on the query vocabulary.
    */
  final case class Bm25Index(postings: DataFrame, df: DataFrame,
      dl: DataFrame, nDocs: Long, avgdl: Double)

  /** Fit the index from the corpus — query-agnostic (FULL postings,
    * unlike q148's in-query pruned tf; the df values agree on every
    * query term by construction).
    */
  def buildBm25Index(s: SparkSession, dir: String): Bm25Index = {
    val d = Tables.documents(s, dir)
    val toks = d.select(col("doc_id"),
      posexplode(split(lower(col("text")), " ")).as(Seq("pos", "term")))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val st = dl.agg(count(lit(1)).as("n"), sum("dl").as("s")).collect()(0)
    // dl DENORMALIZED into the postings (standard posting-list
    // practice): the serve path reads (term, doc, tf, dl) rows and
    // never joins the corpus-sized dl table per request — RetrProbe at
    // 5M docs measured that join as the dominant non-constant serve
    // cost. The dl frame stays in the index for audits.
    Bm25Index(tf.join(dl, Seq("doc_id")), df, dl, st.getLong(0),
      st.getLong(1).toDouble / st.getLong(0))
  }

  def publishBm25(idx: Bm25Index, outDir: String): Unit = {
    // term-clustered layout: hash terms into files, sort within each,
    // so a query's literal In(term, ...) filter prunes at the parquet
    // row-group layer (RetrProbe at 1.5M docs: the unclustered scan
    // cost the serve path ~10 s of pure postings I/O)
    idx.postings.repartition(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$outDir/postings")
    idx.df.write.mode("overwrite").parquet(s"$outDir/df")
    idx.dl.write.mode("overwrite").parquet(s"$outDir/dl")
    val s = idx.postings.sparkSession
    import s.implicits._
    Seq((idx.nDocs, idx.avgdl)).toDF("n_docs", "avgdl")
      .write.mode("overwrite").parquet(s"$outDir/stats")
  }

  def loadBm25(s: SparkSession, outDir: String): Bm25Index = {
    val st = s.read.parquet(s"$outDir/stats").collect()(0)
    Bm25Index(
      s.read.parquet(s"$outDir/postings"),
      s.read.parquet(s"$outDir/df"),
      s.read.parquet(s"$outDir/dl"),
      st.getLong(0), st.getDouble(1))
  }

  /** Serving-path scorer: BM25 top-k for a batch of (query_id, text)
    * requests against a built or loaded index. The same expression
    * tree as q148 with the corpus scalars as literals — bit-identical
    * to the oracle-checked batch ranking (RetrievalSpec); runs per
    * micro-batch under Bm25Serve.serve. The postings scan is pruned
    * map-side by the broadcast query vocabulary before any shuffle.
    *
    * `excludeSelf` (default FALSE for serving — r15 ADVICE): a serve
    * request's query_id is an arbitrary request identifier, so the
    * batch q148 convention of dropping doc_id == query_id would
    * silently lose a corpus document from any request whose id happens
    * to collide with it. Pass true only when the queries ARE corpus
    * docs (the T6 convention the batch-parity spec uses).
    */
  def scoreQueries(queries: DataFrame, idx: Bm25Index,
      excludeSelf: Boolean = false): DataFrame = {
    val qtoks = queries.select(col("query_id"),
      posexplode(split(lower(col("text")), " ")).as(Seq("pos", "term")))
    val wq = Window.partitionBy("query_id").orderBy(asc("fpos"), asc("term"))
    val qterms = qtoks.groupBy("query_id", "term")
      .agg(min("pos").as("fpos"))
      .withColumn("qrk", row_number().over(wq))
      .filter(col("qrk") <= QueryTerms)
      .select("query_id", "term")
    // the query vocabulary is REQUEST state (≤ queries·QueryTerms
    // strings): collect it and push a literal In() filter into the
    // postings scan — on the term-clustered published layout this
    // prunes at the parquet row-group layer, which a join-side
    // broadcast prune can never do
    val vocab = qterms.select("term").distinct().collect().map(_.getString(0))
    val dfq = idx.df.filter(col("term").isin(vocab: _*))
    val pruned = idx.postings.filter(col("term").isin(vocab: _*))
      .join(broadcast(qterms), Seq("term"))
    val candidates =
      if (excludeSelf) pruned.filter(col("doc_id") =!= col("query_id")) else pruned
    val scored = candidates
      .join(broadcast(dfq), Seq("term"))
      .withColumn("idf", log(
        (lit(idx.nDocs).cast(DoubleType) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("tfn",
        col("tf").cast(DoubleType) * lit(K1 + 1.0) /
          (col("tf") + lit(K1) *
            (lit(1.0) - lit(B) + lit(B) * col("dl") / lit(idx.avgdl))))
      .withColumn("s_u", round(col("idf") * col("tfn") * lit(1e6), 0).cast(LongType))
    val w = Window.partitionBy("query_id").orderBy(desc("score_u"), asc("doc_id"))
    scored.groupBy("query_id", "doc_id")
      .agg(sum("s_u").as("score_u"), count(lit(1)).as("n_terms"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= TopK)
      .select("query_id", "rk", "doc_id", "score_u", "n_terms")
  }

  /** T51: hybrid reciprocal-rank fusion of the BM25 (q148) and
    * semantic (q45 brute cosine — the declared-exact rank list; the
    * scale path routes q46/q147 ranks through the same fusion) top-k
    * lists. rrf(d) = Σ_sources 1/(60 + rank_source(d)) over the
    * sources that returned d, quantized to micro-units
    * (round(1e6/(60+rk)) — integer-valued, no FP hazard), absent
    * source contributes 0 (full-outer union of the lists).
    *
    * Id spaces: doc_id and vec_id both enumerate 0..n−1 in this
    * corpus, so the fusion joins them 1:1 by construction; the
    * operator contract is rank-space-only and id-agnostic.
    */
  /** Rank-space RRF of any two (query_id, cand_id, rk_lex/rk_sem)
    * lists — the fusion is retriever-agnostic by design; q149 feeds it
    * q148 + q45, and RetrievalSpec proves the IVFADC (q147) rank list
    * routes through the identical code path at scale.
    */
  def fuseRrf(lex: DataFrame, sem: DataFrame): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(desc("rrf_u"), asc("cand_id"))
    lex.join(sem, Seq("query_id", "cand_id"), "full_outer")
      .withColumn("rrf_u",
        coalesce(round(lit(1e6) / (lit(RrfK) + col("rk_lex")), 0).cast(LongType), lit(0L)) +
          coalesce(round(lit(1e6) / (lit(RrfK) + col("rk_sem")), 0).cast(LongType), lit(0L)))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk"), col("cand_id"), col("rrf_u"),
        col("rk_lex"), col("rk_sem"))
      .orderBy("query_id", "rk")
  }

  def q149HybridRrf(s: SparkSession, dir: String): DataFrame =
    fuseRrf(
      q148Bm25(s, dir)
        .select(col("query_id"), col("doc_id").as("cand_id"),
          col("rk").as("rk_lex")),
      Similarity.q45AnnTopk(s, dir)
        .select(col("probe_id").as("query_id"), col("vec_id").as("cand_id"),
          col("rk").as("rk_sem")))

  val q149Sql: String =
    s"""WITH lex AS MATERIALIZED (
       | SELECT query_id, doc_id AS cand_id, rk AS rk_lex FROM (${q148Sql.replace("ORDER BY query_id, rk", "")})
       |), sem AS MATERIALIZED (
       | SELECT probe_id AS query_id, vec_id AS cand_id, rk AS rk_sem FROM (${Similarity.q45Sql.replace("ORDER BY probe_id, rk", "")})
       |), fused AS (
       | SELECT COALESCE(l.query_id, s.query_id) AS query_id,
       |  COALESCE(l.cand_id, s.cand_id) AS cand_id,
       |  l.rk_lex, s.rk_sem,
       |  COALESCE(CAST(ROUND(1000000.0 / (${RrfK} + l.rk_lex), 0) AS BIGINT), 0) +
       |  COALESCE(CAST(ROUND(1000000.0 / (${RrfK} + s.rk_sem), 0) AS BIGINT), 0) AS rrf_u
       | FROM lex l FULL OUTER JOIN sem s
       |  ON s.query_id = l.query_id AND s.cand_id = l.cand_id
       |), ranked AS (
       | SELECT query_id, cand_id, rrf_u, rk_lex, rk_sem,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_u DESC, cand_id ASC) AS rk
       | FROM fused
       |)
       |SELECT query_id, rk, cand_id, rrf_u, rk_lex, rk_sem FROM ranked
       |WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin
}
