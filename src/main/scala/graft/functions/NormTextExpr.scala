package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd CCNet-style text normalizer — the single-pass twin
  * of the declarative chain
  * `trim(regexp_replace(regexp_replace(translate(lower(t), "123456789",
  * "000000000"), "[^a-z0-9 ]", " "), " +", " "))` that q119's
  * normalize-then-hash dedup keys on.
  *
  * Why an Expression (the CleanNumericExprs rationale, profiled here at
  * the r14 sf10/sf30 dedup rungs): the regex chain is the WHOLE cost of
  * the operator — Diag shows q119's map stage at 771 task-CPU-seconds
  * for 643k docs (~1.2 ms/row) with the shuffle a 22 MB hash-only
  * exchange, i.e. the engine's heaviest linear-cost text op is three
  * Java-regex passes plus their per-row allocation churn. This is one
  * branch-only byte scan.
  *
  * EXACT parity with the chain, argued byte-wise and spec-checked
  * (NormTextSpec drives both forms over adversarial strings):
  *   - `lower` delegates to the same UTF8String.toLowerCase the
  *     built-in uses;
  *   - digits 1-9 map to 0 BEFORE the keep-class test (translate order);
  *   - any maximal run of non-[a-z0-9] bytes (spaces, punctuation,
  *     non-ASCII sequences) collapses to ONE interior space — identical
  *     to per-char space substitution followed by `" +" -> " "`; a
  *     multi-byte codepoint's 2-4 bytes all fall in the non-keep class
  *     (UTF-8 continuation bytes are >= 0x80, negative as Java bytes),
  *     so it collapses exactly like the regex's one-space-per-codepoint
  *     followed by the collapse;
  *   - leading/trailing runs emit nothing (`trim`).
  * The DuckDB oracle twin keeps the regex SQL (q119Sql) — cross-engine
  * equality on real corpora is the driver gate's job, as with every
  * native expression here.
  */
case class NormTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case s: StringType =>
      // r14 advice: rejecting collated strings is correct (the byte-wise
      // parity argument above holds for UTF8_BINARY only), but the old
      // generic message never said why a "string" column was rejected
      TypeCheckResult.TypeCheckFailure(
        "norm_text normalizes UTF8_BINARY strings only (its byte-wise parity " +
          s"with the regex chain assumes binary collation); got ${s.catalogString}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"norm_text requires a string argument, got ${other.catalogString}")
  }
  override def prettyName: String = "norm_text"

  override protected def withNewChildInternal(newChild: Expression): NormTextExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    NormTextExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormTextExpr.normalize($c);")
}

object NormTextExpr {

  /** lower → digit-fold → keep-class scan with run-collapse and trim,
    * one pass over the lowered bytes, two allocations total.
    */
  def normalize(input: UTF8String): UTF8String = {
    val lowered = input.toLowerCase
    val nb = lowered.numBytes
    val out = new Array[Byte](nb)
    var o = 0
    var pending = false
    var i = 0
    while (i < nb) {
      var b = lowered.getByte(i)
      if (b >= '1' && b <= '9') b = '0'
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pending && o > 0) { out(o) = ' '; o += 1 }
        pending = false
        out(o) = b
        o += 1
      } else {
        pending = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }
}
