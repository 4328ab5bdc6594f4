package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives shared by the dedup / text-analysis operators
  * (SURVEY.md §2.3). Everything is a builtin-Column composition — no UDFs
  * — so the hot paths stay inside whole-stage codegen.
  */
object TextFunctions {

  /** Word n-gram shingles of a (single-space-tokenized) text column.
    * Spark: transform over a 1-based index sequence + slice; the DuckDB
    * twin is list_transform(range(1, len-1), i -> l[i]||' '||l[i+1]...).
    *
    * PERF: evaluate on a MATERIALIZED token-array column (see
    * [[shinglesFromTokens]]) — if `text` is a raw expression, every
    * lambda element re-evaluates the split (O(tokens²) string work/row).
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(split(text, " "), n)

  /** Shingles from an already-tokenized array column. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    // guard: Spark's sequence(1, 0) counts DOWN — never emit it
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** 64-bit shingle ids straight from the token array — no n-gram string
    * is ever materialized: each id is one xxhash64 over the n tokens.
    * Counting semantics are identical to string shingles up to hash
    * collisions (~n_shingles²/2⁶⁵, vanishing), so Jaccard counts computed
    * on these ids match the string-shingle oracle while the shuffle
    * carries 8-byte longs instead of n-gram strings.
    */
  def hashedShinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n, call_function("shingle_hash", toks, lit(n)))
      .otherwise(array().cast("array<bigint>"))

  /** The pre-r14 interpreted-HOF form — ShingleHashSpec proves the
    * native `shingle_hash` bit-equal to it (see ShingleHashExpr for why
    * the HOF ran interpreted and what that cost at the sf30 rung).
    */
  private[graft] def hashedShinglesFromTokensHof(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => xxhash64((0 until n).map(k => element_at(toks, i + k + 1)): _*)))
      .otherwise(array().cast("array<bigint>"))

  /** 60-bit non-negative integer hash from md5's first 15 hex chars —
    * the CROSS-ENGINE hash: md5 is bit-identical in Spark and DuckDB
    * and both sides parse the same hex prefix, so hashed-bucket /
    * minhash / simhash operators built on it are fully ORACLE-CHECKED
    * (xxhash64, the previous choice, exists only in Spark and forced
    * those operators into rows-only verification). One md5 per value is
    * map-side, codegen'd, and embarrassingly parallel — the same cost
    * class as q40's md5 dedup at 100 TB.
    */
  def md5Long(c: Column): Column =
    call_function("md5_long", c.cast("string"))

  /** The pre-r14 declarative chain — Md5LongSpec proves the native
    * `md5_long` bit-equal to it (hex render + NumberConverter re-parse
    * vs a direct byte fold; see Md5LongExprs).
    */
  private[graft] def md5LongDeclarative(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Fused md5Long over every n-token window (concat_ws(" ") byte
    * semantics, no shingle string materialized) — the minhash family's
    * map stage. Md5LongSpec pins parity with
    * `md5Long(concat_ws(" ", window))` per element.
    */
  def md5LongNgramsFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n, call_function("md5_long_ngrams", toks, lit(n)))
      .otherwise(array().cast("array<bigint>"))

  /** DuckDB twin of [[md5Long]]. */
  def md5LongSql(e: String): String =
    s"CAST(('0x' || substring(md5(CAST($e AS VARCHAR)), 1, 15)) AS BIGINT)"

  /** SQL twin of [[shingles]] for n=3 (DuckDB list syntax, 1-based). */
  def shinglesSql3(textCol: String): String =
    s"list_transform(range(1, len(string_split($textCol, ' ')) - 1), " +
      s"i -> string_split($textCol, ' ')[i] || ' ' || string_split($textCol, ' ')[i+1] || ' ' || string_split($textCol, ' ')[i+2])"

  /** Tiny per-language stopword lists for the heuristic language ID (T7).
    * Deliberately overlapping (es/fr share articles) like real lists.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "en" -> Seq("the", "a", "is", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "los", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de"),
    "zh" -> Seq("的", "是", "了", "在", "我")
  )

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Count of tokens hitting a language's stopword list — native
    * `token_hits` (one byte scan + one hash probe per token; the
    * declarative filter-HOF this replaces ran interpreted on every
    * documents scan, flagged by InterpretedGuardSpec r15).
    */
  def stopwordHits(text: Column, lang: String): Column = {
    val words = stopwords.toMap.apply(lang)
    call_function("token_hits", text, array(words.map(lit): _*))
  }

  /** The pre-r15 declarative form — spec-pinned equal to the native
    * expression (InterpretedGuardSpec).
    */
  private[graft] def stopwordHitsHof(text: Column, lang: String): Column = {
    val words = stopwords.toMap.apply(lang)
    size(filter(split(text, " "), t => words.map(w => t === w).reduce(_ || _)))
  }

  /** SQL twin of [[stopwordHits]]. */
  def stopwordHitsSql(textCol: String, lang: String): String = {
    val words = stopwords.toMap.apply(lang)
    s"len(list_filter(string_split($textCol, ' '), t -> t IN ${inList(words)}))"
  }
}
