package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.{RollingHashExpr, TextFunctions}

/** Text-analysis operators for training-data curation
  * (SURVEY.md §2.3 T7-T10). All narrow per-document maps — embarrassingly
  * parallel, no shuffle except the final aggregates/sorts.
  */
object TextOps {

  // T7: heuristic language ID — stopword-hit ratio per language, argmax
  // (first language in fixed order wins ties). Output is the
  // (actual, predicted) confusion matrix, which also grades the
  // heuristic's accuracy against the labeled `lang` column.
  def q47LangId(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val langs = TextFunctions.stopwords.map(_._1)
    val withHits = langs.foldLeft(d) { (df, l) =>
      df.withColumn(s"hits_$l", TextFunctions.stopwordHits(col("text"), l))
    }
    val best = langs.map(l => col(s"hits_$l")).reduce((a, b) => greatest(a, b))
    val pred = langs.foldRight(lit("unknown"): Column) { (l, acc) =>
      when(col(s"hits_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    withHits.withColumn("pred_lang", pred)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")
  }

  val q47Sql: String = {
    val langs = TextFunctions.stopwords.map(_._1)
    val hitCols = langs.map(l => s"${TextFunctions.stopwordHitsSql("text", l)} AS hits_$l").mkString(",\n  ")
    val best = langs.map(l => s"hits_$l").reduceRight((a, b) => s"GREATEST($a, $b)")
    val pred = langs.foldRight("'unknown'") { (l, acc) =>
      s"CASE WHEN hits_$l = best AND best > 0 THEN '$l' ELSE $acc END"
    }
    s"""SELECT lang, pred_lang, COUNT(*) AS n FROM (
       | SELECT lang, $pred AS pred_lang FROM (
       |  SELECT lang, $best AS best, hits_de, hits_en, hits_es, hits_fr, hits_zh FROM (
       |   SELECT lang,
       |  $hitCols
       |   FROM documents)))
       |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
  }

  // T8: quality scoring — length, punctuation ratio, stopword ratio, mean
  // word length → equal-weight composite. Each term is rounded BEFORE the
  // 0.25-weighted sum (0.25 is a power of two → exact), so Spark and
  // DuckDB agree bitwise.
  /** The four q48 quality terms over any text column — reusable by the
    * batch query and the streaming curation pipeline (same expression
    * tree, same determinism discipline).
    */
  def qualityTerms(text: Column): (Column, Column, Column, Column) = {
    val nTok = size(split(text, " "))
    val nChar = length(text)
    val punct = nChar - length(regexp_replace(text, "[^a-z0-9 ]", ""))
    val lenTerm = round(least(nTok.cast(DoubleType) / 100.0, lit(1.0)), 6)
    // empty text: define "no punctuation" = perfect term, rather than a
    // 0/0 division (ANSI mode makes that a runtime ERROR, not a NULL —
    // an empty doc would kill a whole streaming query otherwise)
    val punctTerm = when(nChar === 0, lit(1.0))
      .otherwise(round(lit(1.0) - punct.cast(DoubleType) / nChar.cast(DoubleType), 6))
    val stopTerm = round(least(
      TextFunctions.stopwordHits(text, "en").cast(DoubleType) * 10.0 / nTok.cast(DoubleType),
      lit(1.0)), 6)
    val mwl = round(length(regexp_replace(text, " ", "")).cast(DoubleType) / nTok.cast(DoubleType), 6)
    val mwlTerm = round(lit(1.0) - least(abs(mwl - 4.5) / 4.5, lit(1.0)), 6)
    (lenTerm, punctTerm, stopTerm, mwlTerm)
  }

  /** Composite quality score in [0, 1] (the q48 formula). */
  def qualityExpr(text: Column): Column = {
    val (a, b, c, d) = qualityTerms(text)
    round(a + b + c + d, 6) / 4
  }

  /** Unordered q48 scores — the composition form (q58 uses it). */
  def qualityScores(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val nTok = size(split(col("text"), " "))
    val (lenTerm, punctTerm, stopTerm, mwlTerm) = qualityTerms(col("text"))
    d.select(col("doc_id"),
        nTok.cast(LongType).as("n_tokens"),
        lenTerm.as("len_term"), punctTerm.as("punct_term"),
        stopTerm.as("stop_term"), mwlTerm.as("mwl_term"))
      // round the 4-term sum FIRST (each term has ≤6 decimals, so the sum
      // is never near a rounding midpoint), then scale by the exact
      // power-of-two 1/4 — keeps Spark and DuckDB bit-identical.
      .withColumn("quality",
        round(col("len_term") + col("punct_term") +
          col("stop_term") + col("mwl_term"), 6) / 4)
  }

  def q48QualityScore(s: SparkSession, dir: String): DataFrame =
    qualityScores(s, dir).orderBy("doc_id")

  val q48Sql: String = {
    val nTok = "len(string_split(text, ' '))"
    val punct = "LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^a-z0-9 ]', '', 'g'))"
    val stopHits = TextFunctions.stopwordHitsSql("text", "en")
    s"""SELECT doc_id, n_tokens, len_term, punct_term, stop_term, mwl_term,
       | ROUND(((len_term + punct_term) + stop_term) + mwl_term, 6) / 4 AS quality
       |FROM (
       | SELECT doc_id, $nTok AS n_tokens,
       |  ROUND(LEAST(CAST($nTok AS DOUBLE) / 100.0, 1.0), 6) AS len_term,
       |  CASE WHEN LENGTH(text) = 0 THEN 1.0
       |   ELSE ROUND(1.0 - CAST($punct AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE), 6) END AS punct_term,
       |  ROUND(LEAST(CAST($stopHits AS DOUBLE) * 10.0 / CAST($nTok AS DOUBLE), 1.0), 6) AS stop_term,
       |  ROUND(1.0 - LEAST(ABS(ROUND(CAST(LENGTH(REGEXP_REPLACE(text, ' ', '', 'g')) AS DOUBLE) / CAST($nTok AS DOUBLE), 6) - 4.5) / 4.5, 1.0), 6) AS mwl_term
       | FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // T9: token counting — whitespace tokens, BPE-ish subword estimate
  // (runs of ≤4 word chars / digits / single other), chars/4 estimate.
  def q49TokenCount(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val pat = "[a-z]{1,4}|[0-9]{1,4}|[^a-z0-9 ]"
    d.select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast(LongType).as("n_subwords"),
        ceil(length(col("text")).cast(DoubleType) / 4.0).cast(LongType).as("n_chars4"))
      .orderBy("doc_id")
  }

  val q49Sql: String =
    """SELECT doc_id,
      | len(string_split(text, ' ')) AS n_ws_tokens,
      | len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]{1,4}|[^a-z0-9 ]')) AS n_subwords,
      | CAST(CEIL(CAST(LENGTH(text) AS DOUBLE) / 4.0) AS BIGINT) AS n_chars4
      |FROM documents ORDER BY doc_id""".stripMargin

  // T7-extra: TF-IDF keyword extraction — top-3 terms per document by
  // tf·ln(N/df), the standard curation signal for topic/keyword fields.
  // Two shuffles total: token-level tf agg, then df agg broadcast back.
  // ln() differs from DuckDB by ≤1 ulp; round(6) absorbs it, and ranking
  // ties break on the rounded score + token for determinism.
  def q53Tfidf(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    // corpus size for the IDF stays IN-LINEAGE: a one-row aggregate
    // broadcast-crossJoined into the scoring join instead of a driver
    // side d.count() action (a second full corpus scan per execution —
    // round-9 advice; same pattern as Similarity.tfidfWeights). The
    // count branch reads zero columns (footer row counts), and the IEEE
    // division n_docs/df is unchanged, so scores hash identically.
    val nDocsDf = d.agg(count(lit(1)).cast(DoubleType).as("n_docs"))
    val tok = d.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // tf's key set IS the distinct (doc, token) pairs — derive df from it
    // instead of re-exploding + distinct-ing the token stream (one scan
    // and one shuffle fewer; the second agg is map-side partial anyway).
    // The tf >= 1 filter is a tautology (tf is a count) whose only job
    // is plan shape: it consumes the tf VALUE between the two
    // aggregates, so the optimizer cannot rewrite the inner agg into a
    // bare DISTINCT (its aggregate-pruning pass otherwise drops the
    // partial count), which keeps this branch's scan→explode→partial-
    // agg→exchange subtree canonically equal to the join branch's —
    // exchange reuse then serves df from tf's shuffle output instead of
    // re-scanning and re-exploding the whole corpus a second time
    val df = tf.where(col("tf") >= 1).groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("token"))
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(nDocsDf))
      .withColumn("score",
        round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("token"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rk")
  }

  val q53Sql: String =
    s"""SELECT doc_id, rk, token, tf, df, score FROM (
       | SELECT doc_id, token, tf, df,
       |  ROUND(tf * LN(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df), 6) AS score,
       |  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ROUND(tf * LN(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df), 6) DESC, token) AS rk
       | FROM (
       |  SELECT doc_id, token, COUNT(*) AS tf
       |  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents)
       |  WHERE LENGTH(token) > 0 GROUP BY doc_id, token) tf_t
       | JOIN (
       |  SELECT token, COUNT(*) AS df FROM (
       |   SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents)
       |  WHERE LENGTH(token) > 0 GROUP BY token) df_t
       | USING (token))
       |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  // T8-extra: PII redaction — the standard scrub pass before text lands
  // in a training corpus. Emails and US-phone shapes are replaced with
  // typed placeholder tokens; the per-doc redaction counts feed audit
  // metrics. PII is synthesized deterministically (the corpus is clean),
  // so both engines see identical inputs. Pure regexp_replace — narrow,
  // codegen'd, shuffle-free until the final sort.
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\(\\d{3}\\) \\d{3}-\\d{4}"

  def q54Redact(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val dirty = d.withColumn("text2",
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"), lit("@example.com now")))
        .when(col("doc_id") % 5 === 1,
          concat(col("text"), lit(" call (555) 010-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(col("text")))
    dirty.select(
        col("doc_id"),
        regexp_replace(regexp_replace(col("text2"), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>").as("clean_text"),
        size(regexp_extract_all(col("text2"), lit(EmailRe), lit(0))).cast(LongType).as("n_emails"),
        size(regexp_extract_all(col("text2"), lit(PhoneRe), lit(0))).cast(LongType).as("n_phones"))
      .withColumn("was_redacted", (col("n_emails") + col("n_phones")) > 0)
      .orderBy("doc_id")
  }

  val q54Sql: String = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "\\(\\d{3}\\) \\d{3}-\\d{4}"
    s"""SELECT doc_id,
       | REGEXP_REPLACE(REGEXP_REPLACE(text2, '$email', '<EMAIL>', 'g'), '$phone', '<PHONE>', 'g') AS clean_text,
       | len(REGEXP_EXTRACT_ALL(text2, '$email')) AS n_emails,
       | len(REGEXP_EXTRACT_ALL(text2, '$phone')) AS n_phones,
       | (len(REGEXP_EXTRACT_ALL(text2, '$email')) + len(REGEXP_EXTRACT_ALL(text2, '$phone'))) > 0 AS was_redacted
       |FROM (
       | SELECT doc_id,
       |  CASE WHEN doc_id % 5 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
       |       WHEN doc_id % 5 = 1 THEN text || ' call (555) 010-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |       ELSE text END AS text2
       | FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // T8-extra 2: repetition / boilerplate detection (Gopher-style rule) —
  // the fraction of a document's word-2-grams occupied by its single
  // most frequent 2-gram. High values mark templated/boilerplate text
  // that quality-filters drop before training. One explode + two keyed
  // aggregations; fully parallel by doc_id.
  /** Unordered q57 scores — the composition form (q58 uses it). */
  def repetitionScores(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val grams = d
      .withColumn("toks", split(col("text"), " "))
      // hashed gram ids, not gram strings (q41/q120's argument: the
      // oracle checks COUNTS, and per-doc 64-bit collisions are
      // negligible; the string-building transform-HOF ran interpreted
      // on the documents scan — guard-spec r15)
      .select(col("doc_id"),
        explode(TextFunctions.hashedShinglesFromTokens(col("toks"), 2)).as("gram"))
    val counts = grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("n"))
    counts.groupBy("doc_id")
      .agg(sum(col("n")).as("n_grams"), max(col("n")).as("top_gram_n"))
      .withColumn("top_gram_frac",
        round(col("top_gram_n").cast(DoubleType) / col("n_grams").cast(DoubleType), 6))
      .withColumn("is_repetitive", col("top_gram_frac") > 0.2)
  }

  def q57Repetition(s: SparkSession, dir: String): DataFrame =
    repetitionScores(s, dir).orderBy("doc_id")

  val q57Sql: String = {
    val g2 = "list_transform(range(1, len(string_split(text, ' '))), " +
      "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])"
    s"""SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_grams, MAX(n) AS top_gram_n,
       | ROUND(CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6) AS top_gram_frac,
       | ROUND(CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6) > 0.2 AS is_repetitive
       |FROM (
       | SELECT doc_id, gram, COUNT(*) AS n FROM (
       |  SELECT doc_id, UNNEST($g2) AS gram FROM documents)
       | GROUP BY doc_id, gram)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // T10: document fingerprint via the custom rolling-hash Catalyst
  // Expression (functions/RollingHash.scala) — native codegen, no UDF.
  // Normalization: lowercase + collapse whitespace. Oracle-checked: the
  // polynomial hash h = Σ byte_i·257^i mod (2^61-1) is re-expressed in
  // DuckDB as a Horner fold (list_reduce) over the UTF-8 bytes
  // recovered from hex(encode(text)) — HUGEINT keeps the modular
  // products exact.
  def q50Fingerprint(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val norm = regexp_replace(lower(col("text")), "\\s+", " ")
    // both directions are defined over the BYTE sequence (the rev
    // expression folds the same bytes with reversed powers) — never via
    // string reverse(), whose code-point vs grapheme-cluster semantics
    // differ between engines on combining characters.
    d.select(col("doc_id"),
        RollingHashExpr.rollingHash(norm).as("fingerprint"),
        RollingHashExpr.rollingHashRev(norm).as("fingerprint_rev"))
      .orderBy("doc_id")
  }

  val q50Sql: String = {
    val mod = "2305843009213693951" // 2^61 - 1, matches RollingHashExpr.Mod
    // UTF-8 bytes recovered from a MATERIALIZED hex(encode(..)) column —
    // never recompute the encode inside the lambda (per-element
    // re-evaluation is the O(n²) HOF trap).
    def bytesOf(hx: String): String =
      s"""list_transform(range(1, (length($hx) // 2) + 1),
         | i -> 16 * (strpos('0123456789ABCDEF', substr($hx, 2*i-1, 1)) - 1)
         |       + strpos('0123456789ABCDEF', substr($hx, 2*i, 1)) - 1)""".stripMargin
    // forward hash Σ b_i·257^i == Horner over the REVERSED byte list;
    // the rev hash Σ b_i·257^(n-1-i) == Horner over the FORWARD list.
    // Seed 0 via list_prepend; HUGEINT keeps acc*257 exact before mod.
    def horner(bytes: String): String =
      s"""CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), $bytes),
         | (acc, x) -> (acc * 257 + x) % $mod) AS BIGINT)""".stripMargin
    s"""SELECT doc_id,
       | ${horner(s"list_reverse(${bytesOf("hx")})")} AS fingerprint,
       | ${horner(bytesOf("hx"))} AS fingerprint_rev
       |FROM (SELECT doc_id, hex(encode(norm)) AS hx
       |      FROM (SELECT doc_id, REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g') AS norm
       |            FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  // T22: corpus bigram language-model scoring — per-document mean
  // conditional bigram probability p(w_i | w_{i-1}) under the corpus's own
  // bigram counts (the self-perplexity signal used to flag out-of-
  // distribution documents, KenLM-style but deterministic: probabilities
  // are exact count ratios and the per-doc sum is a SEQUENTIAL fold in
  // position order, so both engines produce bit-identical doubles).
  // Scale shape: one explode (linear in tokens), two hash aggregates for
  // the count tables, two keyed joins to re-attach counts — no broadcast
  // (vocabulary tables size with the corpus), no window.
  def q76BigramLm(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val toks = d.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
    val bi = toks
      .withColumn("i", explode(when(col("n") > 1, sequence(lit(0), col("n") - 2)).otherwise(array())))
      .select(col("doc_id"), col("i"),
        element_at(col("toks"), col("i") + 1).as("w1"),
        element_at(col("toks"), col("i") + 2).as("w2"))
    // single lineage: both corpus counts attach as WINDOW counts over the
    // bigram occurrences themselves (count over (w1,w2) = c2, count over
    // (w1) = c1) — the corpus explode runs exactly once and there are no
    // count-table joins; the count-table + join form re-evaluated the
    // explode once per consumer (AQE exchange reuse does not fire across
    // the differently-pruned branches)
    val scored = bi
      .withColumn("c2", count(lit(1)).over(Window.partitionBy("w1", "w2")))
      .withColumn("c1", count(lit(1)).over(Window.partitionBy("w1")))
      .select(col("doc_id"), col("i"),
        (col("c2").cast(DoubleType) / col("c1")).as("p"))
    scored.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        // position-ordered sequential fold: sort by i, then left-fold +
        aggregate(
          transform(array_sort(collect_list(struct(col("i"), col("p")))), x => x("p")),
          lit(0.0), (acc, x) => acc + x).as("psum"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("psum"), 6).as("lm_sum"),
        round(col("psum") / col("n_bigrams"), 6).as("lm_mean"))
      .orderBy("doc_id")
  }

  val q76Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t,
      |   len(string_split(text, ' ')) AS n
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, i, t[i+1] AS w1, t[i+2] AS w2
      |  FROM (SELECT doc_id, t, unnest(range(0, n-1)) AS i FROM toks)),
      |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY 1, 2),
      |c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1),
      |scored AS (
      |  SELECT doc_id, i, CAST(c2.c2 AS DOUBLE) / c1.c1 AS p
      |  FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      | ROUND(list_sum(list(p ORDER BY i)), 6) AS lm_sum,
      | ROUND(list_sum(list(p ORDER BY i)) / COUNT(*), 6) AS lm_mean
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // T28: CCNet-style per-language perplexity bucketing (Wenzek et al.,
  // "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  // Data", LREC 2020): score every document under the corpus bigram LM
  // (q76's single-lineage window form) and split each LANGUAGE into
  // head/middle/tail thirds by mean negative log-likelihood — the
  // standard quality gate before LLM pretraining.
  //
  // Determinism: per-bigram NLL is quantized to integer MICRO-NATS
  // (round(-ln(p)·1e6) as BIGINT — ln differs from DuckDB by ≤1 ulp,
  // absorbed exactly like q53's round(6)), so the per-doc sum is exact
  // long arithmetic no matter the aggregation order; the bucket NTILE
  // orders by (exact-int ratio as IEEE double, doc_id) — identical in
  // both engines. Scale: one corpus explode, two window counts keyed by
  // bigram, and a PER-LANGUAGE ntile (keyed shuffle, no global sort).
  def q110DocPerplexity(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val toks = d.select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
    val bi = toks
      .withColumn("i", explode(when(col("n") > 1, sequence(lit(0), col("n") - 2)).otherwise(array())))
      .select(col("doc_id"), col("lang"),
        element_at(col("toks"), col("i") + 1).as("w1"),
        element_at(col("toks"), col("i") + 2).as("w2"))
    // same single-lineage shape as q76: both LM counts attach as windows
    // over the bigram occurrences — the corpus explode runs exactly once
    val scored = bi
      .withColumn("c2", count(lit(1)).over(Window.partitionBy("w1", "w2")))
      .withColumn("c1", count(lit(1)).over(Window.partitionBy("w1")))
      .withColumn("nll_u",
        round(-log(col("c2").cast(DoubleType) / col("c1")) * 1e6, 0).cast(LongType))
    val agg = scored.groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"), sum("nll_u").as("nll_micro"))
    val meanNll = col("nll_micro").cast(DoubleType) / col("n_bigrams") / 1e6
    agg.select(col("doc_id"), col("lang"), col("n_bigrams"), col("nll_micro"),
        round(exp(meanNll), 6).as("ppl_r6"),
        ntile(3).over(Window.partitionBy("lang").orderBy(meanNll, col("doc_id")))
          .cast(LongType).as("ppl_bucket"))
      .orderBy("doc_id")
  }

  val q110Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS t,
      |   len(string_split(text, ' ')) AS n
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, lang, t[i+1] AS w1, t[i+2] AS w2
      |  FROM (SELECT doc_id, lang, t, unnest(range(0, n-1)) AS i FROM toks)),
      |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY 1, 2),
      |c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1),
      |scored AS (
      |  SELECT doc_id, lang,
      |   CAST(ROUND(-LN(CAST(c2.c2 AS DOUBLE) / c1.c1) * 1000000, 0) AS BIGINT) AS nll_u
      |  FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1)),
      |agg AS (
      |  SELECT doc_id, lang, COUNT(*) AS n_bigrams,
      |   CAST(SUM(nll_u) AS BIGINT) AS nll_micro
      |  FROM scored GROUP BY 1, 2)
      |SELECT doc_id, lang, n_bigrams, nll_micro,
      | ROUND(EXP(CAST(nll_micro AS DOUBLE) / n_bigrams / 1000000.0), 6) AS ppl_r6,
      | NTILE(3) OVER (PARTITION BY lang
      |   ORDER BY CAST(nll_micro AS DOUBLE) / n_bigrams / 1000000.0, doc_id) AS ppl_bucket
      |FROM agg ORDER BY doc_id""".stripMargin

  // T29: unigram-entropy / type-token diagnostics — per-document Shannon
  // entropy of the token distribution plus type-token ratio, the
  // info-theoretic complement of T8's surface quality score (low-entropy
  // docs are template/boilerplate; TTR near 0 flags repetition like T17
  // but in one map-side pass). Entropy = Σ (c/n)·ln(n/c), computed as
  // exact long micro-nats per TYPE (round(c·ln(n/c)·1e6)) so the sum is
  // aggregation-order-proof; one groupBy(doc, token) + one keyed window
  // — scales as a pure keyed shuffle.
  def q112EntropyStats(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val tok = d.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val counts = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("doc_id")))
      .withColumn("ent_u",
        round(col("c") * log(col("n").cast(DoubleType) / col("c")) * 1e6, 0).cast(LongType))
    counts.groupBy("doc_id")
      .agg(
        max(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("ent_u")).as("ent_micro"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast(DoubleType) / col("n_tokens"), 6).as("ttr"),
        col("ent_micro"),
        round(col("ent_micro").cast(DoubleType) / col("n_tokens") / 1e6, 6).as("entropy_r6"))
      .orderBy("doc_id")
  }

  val q112Sql: String =
    """WITH counts AS (
      |  SELECT doc_id, token, COUNT(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE len(token) > 0 GROUP BY 1, 2),
      |w AS (
      |  SELECT doc_id, c,
      |   CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
      |  FROM counts),
      |q AS (
      |  SELECT doc_id, n,
      |   CAST(ROUND(c * LN(CAST(n AS DOUBLE) / c) * 1000000, 0) AS BIGINT) AS ent_u
      |  FROM w)
      |SELECT doc_id, MAX(n) AS n_tokens, COUNT(*) AS n_types,
      | ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(n), 6) AS ttr,
      | CAST(SUM(ent_u) AS BIGINT) AS ent_micro,
      | ROUND(CAST(CAST(SUM(ent_u) AS BIGINT) AS DOUBLE) / MAX(n) / 1000000.0, 6) AS entropy_r6
      |FROM q GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // T36: the Gopher repetition-rule TABLE (Rae et al. 2021, Table A1) —
  // T17 generalized from one rule to the published family: per (doc, n)
  // the fraction of n-grams occupied by the single most frequent n-gram
  // (n=2,3,4 with thresholds 0.20/0.18/0.16) and the fraction of n-gram
  // occurrences that are repeats (n=5,10 with 0.15/0.10; Gopher states
  // the dup rules over characters — re-expressed over token occurrences,
  // same signal, exact integer arithmetic). Long format: one row per
  // (doc, n) with its metric pair and pass verdict.
  // Scale shape: one stacked explode (5 gram lengths in one pass over
  // the token array), one (doc_id, n, gram) count, one (doc_id, n)
  // rollup — all keyed by doc, fully parallel, no corpus re-scan per n.
  val GopherNs: Seq[Int] = Seq(2, 3, 4, 5, 10)
  val GopherThr: Map[Int, Double] =
    Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16, 5 -> 0.15, 10 -> 0.10)

  def q120GopherRules(s: SparkSession, dir: String): DataFrame =
    gopherRules(Tables.documents(s, dir)).orderBy("doc_id", "n")

  /** The rule table over any (doc_id, text) frame — the spec drives it
    * with constructed repetitive docs, since the test corpus genuinely
    * passes every published threshold.
    */
  def gopherRules(d: DataFrame): DataFrame = {
    val toks = d.select(col("doc_id"), split(col("text"), " ").as("toks"))
    // count on 64-bit hashed gram ids (q41's argument): the stats only
    // need gram EQUALITY, so the (doc_id, n, gram) exchange carries
    // 8-byte longs instead of up-to-10-token strings — measured 1.36 s
    // → 0.74 s at sf0.1 (min-of-3), and at 100 TB the shuffle shrinks
    // ~10×; the
    // string-gram DuckDB oracle still hash-matches (collision odds
    // ~grams²/2⁶⁵ per doc, vanishing)
    val stacked = toks
      .select(col("doc_id"), explode(array(GopherNs.map(n =>
        struct(lit(n).as("n"),
          TextFunctions.hashedShinglesFromTokens(col("toks"), n).as("grams"))): _*)).as("x"))
      .select(col("doc_id"), col("x.n").as("n"), explode(col("x.grams")).as("gram"))
    val thr = GopherNs.tail.foldLeft(when(col("n") === GopherNs.head, GopherThr(GopherNs.head))) {
      (acc, n) => acc.when(col("n") === n, GopherThr(n))
    }
    stacked.groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n")
      .agg(sum("c").as("n_grams"), max("c").as("top_n"),
        sum(col("c") - 1).as("dup_n"))
      .withColumn("top_frac",
        round(col("top_n").cast(DoubleType) / col("n_grams").cast(DoubleType), 6))
      .withColumn("dup_frac",
        round(col("dup_n").cast(DoubleType) / col("n_grams").cast(DoubleType), 6))
      .withColumn("passes",
        when(col("n") <= 4, col("top_frac") <= thr).otherwise(col("dup_frac") <= thr))
      .select("doc_id", "n", "n_grams", "top_n", "dup_n",
        "top_frac", "dup_frac", "passes")
  }

  val q120Sql: String = {
    val thrSql = GopherNs.map(n => s"WHEN $n THEN CAST(${GopherThr(n)} AS DOUBLE)")
      .mkString("CASE n ", " ", " END")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t,
       |   len(string_split(text, ' ')) AS L
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, n, array_to_string(t[i:i+n-1], ' ') AS gram
       |  FROM (SELECT doc_id, t, n, unnest(range(1, L - n + 2)) AS i
       |        FROM toks CROSS JOIN (SELECT unnest([${GopherNs.mkString(", ")}]) AS n) ns)),
       |counts AS (SELECT doc_id, n, gram, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
       |stats AS (
       |  SELECT doc_id, n, CAST(SUM(c) AS BIGINT) AS n_grams,
       |   CAST(MAX(c) AS BIGINT) AS top_n, CAST(SUM(c - 1) AS BIGINT) AS dup_n
       |  FROM counts GROUP BY 1, 2)
       |SELECT doc_id, n, n_grams, top_n, dup_n,
       | ROUND(CAST(top_n AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS top_frac,
       | ROUND(CAST(dup_n AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS dup_frac,
       | CASE WHEN n <= 4
       |  THEN ROUND(CAST(top_n AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) <= $thrSql
       |  ELSE ROUND(CAST(dup_n AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) <= $thrSql
       | END AS passes
       |FROM stats ORDER BY doc_id, n""".stripMargin
  }
}
