package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over Array[Float] embedding columns (SURVEY.md §2.3 T5/T6).
  *
  * All arithmetic is double-precision and STRICTLY SEQUENTIAL
  * (zip_with → aggregate left fold), which makes the result bit-identical
  * to the DuckDB twin `list_sum(list_transform(range(...), ...))` — both
  * engines fold the 64 products left-to-right in IEEE double. That is
  * what lets cosine similarities be oracle-compared exactly after
  * rounding. Builtin higher-order functions only: codegen-friendly, no
  * UDF boxing per element.
  */
object VectorFunctions {

  /** Sequential double dot product of two float-array columns.
    * Since round 8 this resolves to the native [[DotProductExpr]]
    * (registered via GraftExtensions): one codegen'd static call per
    * row instead of an interpreted HOF with a materialized zip array —
    * the exact same IEEE fold, parity-spec'd against [[dotHof]].
    */
  def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** The declarative HOF form `dot` replaced — kept as the readable
    * statement of the fold's semantics and the parity oracle for
    * VectorExprsSpec.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity, rounded for cross-engine comparison. NULL when
    * either vector has zero norm: cosine is undefined there, and under
    * ANSI mode (Spark 4 default) the raw 0-division would be a runtime
    * ERROR that kills the whole job, not a NULL.
    */
  def cosine(a: Column, b: Column, scale: Int = 6): Column = {
    val n2a = norm2(a)
    val n2b = norm2(b)
    when(n2a === 0.0 || n2b === 0.0, lit(null).cast("double"))
      .otherwise(round(dot(a, b) / (sqrt(n2a) * sqrt(n2b)), scale))
  }

  /** DuckDB twins (same sequential fold). */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  def cosineSql(a: String, b: String, scale: Int = 6): String =
    s"""CASE WHEN ${dotSql(a, a)} = 0.0 OR ${dotSql(b, b)} = 0.0 THEN NULL
       | ELSE ROUND(${dotSql(a, b)} / (SQRT(${dotSql(a, a)}) * SQRT(${dotSql(b, b)})), $scale) END""".stripMargin
}
