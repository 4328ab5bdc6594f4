package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native random-hyperplane LSH signature (q109's band keys) — ALL
  * bands' keys in one pass over the embedding (the DotProductExpr
  * playbook, SURVEY §3 ladder step (b)).
  *
  * Why: the declarative form is `bits` gated CASE branches per band,
  * each wrapping an `aggregate(zip_with(...))` higher-order fold —
  * HOFs never enter whole-stage codegen, so a 10-bit dial ran 40
  * interpreted lambda folds (each materializing a zipped intermediate
  * array) per row; measured at gen2-sf3 the signature projection alone
  * cost 58-300 s of task time. This expression emits one static call
  * that computes every plane dot as a straight fused loop — the same
  * IEEE sequence (LCG plane value, strict left fold in dimension
  * order, `dot >= 0` rounding, MSB-first key packing), verified
  * bit-for-bit against an independent reimplementation by the r11 spec
  * and against DuckDB by the unchanged q109 oracle twin.
  *
  * Null semantics mirror the HOF chain: any null input → null row
  * (nullSafeEval); a null ELEMENT made the old chain's dot null and
  * `when(dot >= 0, 1).otherwise(0)` then chose 0 — the helper does the
  * same (bit 0), though no corpus column carries null elements.
  *
  * args: (embedding array<float>, bits int, bands int-literal,
  * maxBits int-literal) — the literals ride as children so the plan
  * string shows the effective dial (the conf-honored spec asserts on
  * it) and SQL callers can pass them positionally.
  */
case class RpLshKeysExpr(emb: Expression, bits: Expression,
    bands: Expression, maxBits: Expression) extends QuaternaryExpression {

  override def first: Expression = emb
  override def second: Expression = bits
  override def third: Expression = bands
  override def fourth: Expression = maxBits

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rp_lsh_keys"

  override def checkInputDataTypes(): TypeCheckResult =
    (emb.dataType, bits.dataType, bands.dataType, maxBits.dataType) match {
      case (ArrayType(FloatType, _), IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "rp_lsh_keys requires (array<float>, int, int, int), got " +
          Seq(emb, bits, bands, maxBits).map(_.dataType.catalogString).mkString(", "))
    }

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression,
      third: Expression, fourth: Expression): RpLshKeysExpr =
    copy(emb = first, bits = second, bands = third, maxBits = fourth)

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    RpLshKeysExpr.keys(a.asInstanceOf[ArrayData], b.asInstanceOf[Int],
      c.asInstanceOf[Int], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.RpLshKeysExpr.keys($a, $b, $c, $d);")
}

object RpLshKeysExpr {

  /** For band b, bit i (i < bits): plane h = b·maxBits + i; plane value
    * at 1-based dimension d is
    * ((1103515245·(h·1000003 + d) + 12345) mod 2^31)/2^31 − 0.5; the
    * dot is the strict left fold Σ_d e[d]·plane(h,d) in double
    * arithmetic; bit = [dot ≥ 0]; key packs MSB-first. All identical
    * to the declarative chain this replaces (and to the DuckDB twin).
    */
  def keys(emb: ArrayData, bits: Int, bands: Int, maxBits: Int): ArrayData = {
    // rp_lsh_keys is a PUBLIC SQL function, so the value guards live
    // here, not only in Dedup.q109EmbedLsh's conf validation (r11
    // ADVICE: a direct caller with bands < 0 threw
    // NegativeArraySizeException from generated code, and bits > 31
    // silently wrapped the int shift into corrupt keys)
    if (bits < 1 || bits > 31)
      throw new IllegalArgumentException(
        s"rp_lsh_keys: bits=$bits outside [1, 31]")
    if (bands < 1 || bands > 64)
      throw new IllegalArgumentException(
        s"rp_lsh_keys: bands=$bands outside [1, 64]")
    if (maxBits < bits || maxBits > 64)
      throw new IllegalArgumentException(
        s"rp_lsh_keys: maxBits=$maxBits outside [bits=$bits, 64]")
    val n = emb.numElements()
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var key = 0
      var i = 0
      while (i < bits) {
        val seed = (b * maxBits + i).toLong * 1000003L
        var acc = 0.0
        var anyNull = false
        var d = 1
        while (d <= n && !anyNull) {
          if (emb.isNullAt(d - 1)) anyNull = true
          else {
            val lcg = (1103515245L * (seed + d) + 12345L) % 2147483648L
            acc += emb.getFloat(d - 1).toDouble *
              (lcg.toDouble / 2147483648.0 - 0.5)
          }
          d += 1
        }
        // null-poisoned dot → the HOF chain's otherwise(0) branch
        val bit = if (!anyNull && acc >= 0.0) 1 else 0
        key = (key << 1) | bit
        i += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }
}
