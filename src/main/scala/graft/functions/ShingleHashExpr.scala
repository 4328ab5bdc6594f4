package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native fused n-gram shingle hasher: token array → one xxhash64 id
  * per n-token window, in a single codegen'd pass.
  *
  * This is the rp_lsh_keys lesson (SURVEY §7i) applied to the shingle
  * family: the declarative form —
  * `transform(sequence(...), i -> xxhash64(element_at(toks, i+1), ...))`
  * — is a HigherOrderFunction, and HOF lambdas run INTERPRETED: per
  * shingle, a lambda frame, n boxed element_at calls with per-call
  * bounds checks, and an interpreted XxHash64 eval. Diag at the r14
  * sf30 dedup rung put q41's shingle stage at 744 task-CPU-seconds for
  * ~60M shingles with a hash-only 1.3 GB shuffle — the engine's
  * second-largest map-CPU hotspot after the (also fixed) q119 regex
  * chain.
  *
  * EXACT parity with `xxhash64(tok_i, …, tok_{i+n-1})`: Spark's
  * XxHash64 folds children left-to-right from seed 42 via
  * `XXH64.hashUTF8String(child, seed)` (UTF8_BINARY collation — the
  * engine never sets another) and SKIPS null children; this expression
  * calls the same static fold per window, so ids are bit-identical
  * (ShingleHashSpec proves it against the HOF form). Oracle posture is
  * unchanged: consumers are oracle-checked through COUNTS over the ids
  * (q41's scaladoc argument), never the ids themselves.
  */
case class ShingleHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.dataType == IntegerType && right.foldable =>
      // r14 advice: via raw SQL a foldable n <= 0 (or null) silently
      // yielded m-n+1 degenerate seed-only windows — the when(size>=n)
      // guard lives only in the Column wrappers, so reject it here
      right.eval() match {
        case n: Int if n >= 1 => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"shingle_hash requires n >= 1, got ${Option(other).getOrElse("null")}")
      }
    case ArrayType(e: StringType, _) if e != StringType =>
      TypeCheckResult.TypeCheckFailure(
        "shingle_hash hashes UTF8_BINARY strings only (its xxhash64 parity " +
          s"argument assumes binary collation); got array<${e.catalogString}>")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash requires (array<string>, foldable int), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def prettyName: String = "shingle_hash"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(toks: Any, n: Any): Any =
    ShingleHashExpr.hashShingles(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.ShingleHashExpr.hashShingles($t, $n);")
}

object ShingleHashExpr {

  private val Seed = 42L // XxHash64's default seed

  /** One pass, one primitive long[] — no lambda frames, no boxing. */
  def hashShingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return ArrayData.toArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      var h = Seed
      var k = 0
      while (k < n) {
        // split() never yields null tokens, but match XxHash64's
        // null-skip fold exactly anyway
        if (!toks.isNullAt(i + k)) {
          h = XXH64.hashUTF8String(toks.getUTF8String(i + k), h)
        }
        k += 1
      }
      out(i) = h
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
