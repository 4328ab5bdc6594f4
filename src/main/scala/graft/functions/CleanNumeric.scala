package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Accounting-string → numeric cleaner (reference: OCRClean.py:30-88
  * `num_strip`): parentheses mean negative, OCR `I`/`l` read as `1`,
  * `$ , spaces` stripped, the LAST period is the decimal separator, a
  * fractional part longer than 2 digits means the periods were thousands
  * separators, and a bare `-`/`.` is 0.0.
  *
  * [[messy]] and [[clean]] resolve to the native codegen'd Catalyst
  * expressions in [[CleanNumericExprs]] (registered via
  * SparkSessionExtensions): one static call per value inside the
  * generated stage. They were previously pure Column compositions
  * (translate/regexp/CASE); those trees duplicate sub-terms at every
  * reference, and with two messy + two clean columns in one stage
  * (q103) the generated span blew Janino's 64 KB limit, losing
  * whole-stage codegen for the hottest projection in the repo — see
  * CleanNumericExprs for the measured story. `messySqlExpr`/
  * `cleanSqlExpr` below stay the oracle's ANSI-SQL source of truth; the
  * expression helpers replicate their arithmetic exactly.
  */
object CleanNumeric {

  /** Messy-string generator: deterministically re-creates the OCR mess the
    * reference cleans, from a clean (value, key) pair. Variant by key%6:
    * 0 `$1,234.56`  1 `(1,234.56)` (negative)  2 `I,234.56` (OCR 1→I)
    * 3 padded whitespace  4 bare `-` (null-ish)  5 `-1234.56`
    * (leading-hyphen negative, no commas).
    */
  def messy(value: Column, key: Column): Column =
    call_function("messy_numeric", value.cast(DoubleType), key.cast(LongType))

  /** SQL twin of [[messy]] (DuckDB dialect; `//` = integer division) —
    * kept as a single expression string pasteable into oracle queries.
    */
  def messySqlExpr(value: String, key: String): String = {
    // NULL guard: the native MessyNumericExpr is nullSafeEval (either
    // input NULL -> NULL), whereas a bare CASE (key)%6 ... ELSE would
    // fall through to the variant-5 branch on a NULL key. The corpus
    // never feeds NULL keys, but the twins must agree off-corpus too
    // (r7 advice) — so the SQL twin short-circuits NULLs the same way.
    val c = s"CAST(ROUND(($value) * 100, 0) AS BIGINT)"
    val ip = s"(($c) // 100)"
    val fr = s"LPAD(CAST(($c) % 100 AS VARCHAR), 2, '0')"
    val g =
      s"""CASE WHEN $ip >= 1000000 THEN CAST($ip // 1000000 AS VARCHAR) || ',' || LPAD(CAST(($ip // 1000) % 1000 AS VARCHAR), 3, '0') || ',' || LPAD(CAST($ip % 1000 AS VARCHAR), 3, '0')
         |     WHEN $ip >= 1000 THEN CAST($ip // 1000 AS VARCHAR) || ',' || LPAD(CAST($ip % 1000 AS VARCHAR), 3, '0')
         |     ELSE CAST($ip AS VARCHAR) END""".stripMargin
    val base = s"(($g) || '.' || $fr)"
    s"""CASE WHEN ($value) IS NULL OR ($key) IS NULL THEN NULL
       |ELSE CASE ($key) % 6
       | WHEN 0 THEN '$$' || $base
       | WHEN 1 THEN '(' || $base || ')'
       | WHEN 2 THEN TRANSLATE($base, '1', 'I')
       | WHEN 3 THEN '  ' || $base || ' '
       | WHEN 4 THEN '-'
       | ELSE '-' || REGEXP_REPLACE($base, ',', '', 'g')
       |END END""".stripMargin
  }

  /** The cleaner: raw messy string → (value, was_negative applied).
    * Negatives arrive as accounting parens OR a leading hyphen — the
    * reference keeps a first-position '-' (OCRClean.py:62
    * `(?<!^)-` removes only non-leading hyphens).
    */
  def clean(raw: Column): Column =
    call_function("clean_numeric", raw)

  /** SQL twin of [[clean]] — same branches, same regexes. */
  def cleanSqlExpr(raw: String): String = {
    val s = s"TRIM($raw)"
    val t = s"REGEXP_REPLACE(TRANSLATE($s, 'Il', '11'), '[^0-9.]', '', 'g')"
    s"""(CASE WHEN $s LIKE '(%' OR ($s LIKE '-%' AND $s <> '-') THEN -1 ELSE 1 END) * (
       |CASE WHEN REGEXP_REPLACE($t, '[^0-9]', '', 'g') = '' THEN 0.0
       | WHEN LENGTH($t) - LENGTH(REGEXP_REPLACE($t, '\\.', '', 'g')) = 0 THEN CAST($t AS DOUBLE)
       | WHEN LENGTH(REGEXP_EXTRACT($t, '^(.*)\\.([^.]*)$$', 2)) BETWEEN 1 AND 2
       |  THEN CAST(COALESCE(NULLIF(REGEXP_REPLACE(REGEXP_EXTRACT($t, '^(.*)\\.([^.]*)$$', 1), '\\.', '', 'g'), ''), '0') || '.' || REGEXP_EXTRACT($t, '^(.*)\\.([^.]*)$$', 2) AS DOUBLE)
       | ELSE CAST(COALESCE(NULLIF(REGEXP_REPLACE(REGEXP_EXTRACT($t, '^(.*)\\.([^.]*)$$', 1), '\\.', '', 'g') || REGEXP_EXTRACT($t, '^(.*)\\.([^.]*)$$', 2), ''), '0') AS DOUBLE)
       |END)""".stripMargin
  }
}
