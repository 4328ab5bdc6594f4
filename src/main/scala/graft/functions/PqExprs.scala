package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Product-quantization codec (SURVEY §2.3 T47, q145): the trained
  * codebook — M subspaces × K centroids × D dims — folded ONCE at plan
  * time into a [[PqBook]] codegen reference object (the
  * BpeCountWithExpr playbook), so the encode pass is one static call
  * per row inside whole-stage codegen and the table never re-parses
  * per row.
  *
  * Determinism contract (what lets q145 be oracle-checked): every
  * distance is the STRICT LEFT FOLD the engine uses everywhere else —
  * d2 = dot(x,x) − 2.0·dot(x,c) + dot(c,c), each dot folding dims in
  * ascending order in IEEE double (VectorFunctions.dotSql's exact
  * sequence), with dot(c,c) precomputed once per centroid at fold time
  * using the same loop. The argmin keeps the FIRST strict improvement
  * over centroids in cid order — identical to the DuckDB twin's
  * ROW_NUMBER() OVER (ORDER BY d2 ASC, cid ASC).
  */
final class PqBook(flat: Array[Double], val m: Int, val k: Int, val d: Int)
    extends Serializable {
  require(m >= 1 && m <= 16, s"pq: m=$m subspaces outside [1, 16]")
  require(k >= 2 && k <= 16,
    s"pq: k=$k centroids outside [2, 16] (codes pack as 4-bit nibbles)")
  require(d >= 1 && d <= 4096, s"pq: d=$d dims/subspace outside [1, 4096]")
  require(flat.length == m * k * d,
    s"pq: codebook length ${flat.length} != m*k*d = ${m * k * d}")

  // dot(c,c) per (subspace, centroid): the same ascending-dim left fold
  // as the oracle's list_sum(list_transform(...)) on the centroid list.
  private val n2c: Array[Double] = {
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m * k) {
      var acc = 0.0
      var i = 0
      val base = s * d
      while (i < d) { val c = flat(base + i); acc += c * c; i += 1 }
      out(s) = acc
      s += 1
    }
    out
  }

  /** Packed PQ code: nibble mi holds the argmin centroid of subspace
    * mi. Null on a null/missing element or a length mismatch (the
    * vec_dot null-poison convention). NaN distances never beat the
    * running best (strict <), matching the twin's NaN-last sort order
    * when the first centroid's d2 is finite — on-corpus all distances
    * are finite.
    */
  def encode(vec: ArrayData, isFloat: Boolean): java.lang.Long = {
    if (vec == null || vec.numElements() != m * d) return null
    var code = 0L
    var mi = 0
    while (mi < m) {
      val vbase = mi * d
      var n2x = 0.0
      var i = 0
      while (i < d) {
        if (vec.isNullAt(vbase + i)) return null
        val x = if (isFloat) vec.getFloat(vbase + i).toDouble
                else vec.getDouble(vbase + i)
        n2x += x * x
        i += 1
      }
      var bestK = 0
      var bestD2 = 0.0
      var ki = 0
      while (ki < k) {
        val cbase = (mi * k + ki) * d
        var dot = 0.0
        i = 0
        while (i < d) {
          val x = if (isFloat) vec.getFloat(vbase + i).toDouble
                  else vec.getDouble(vbase + i)
          dot += x * flat(cbase + i)
          i += 1
        }
        val d2 = n2x - 2.0 * dot + n2c(mi * k + ki)
        if (ki == 0 || d2 < bestD2) { bestD2 = d2; bestK = ki }
        ki += 1
      }
      code |= bestK.toLong << (4 * mi)
      mi += 1
    }
    java.lang.Long.valueOf(code)
  }

  /** Row-local ADC lookup table for a probe (residual) vector: slot
    * mi·k + ki holds round(d2(sub_mi, c_mi,ki) · 1e6) as a long — the
    * EXACT bit sequence of the declarative batch assembly
    * `round(norm2(sub) − 2·vec_dot(sub, centroid) + n2c, 0).cast(long)`:
    * ascending-dim IEEE folds, n2c from the same precomputed loop, and
    * Spark Round's BigDecimal HALF_UP → toDouble → toLong tail.
    * Makes LUT construction a single codegen'd call per arriving probe
    * (q147's batch path assembles the same array via explode + keyed
    * collect_list — fine once per query, wrong per serving request).
    * Null on a null/missing element or a length mismatch.
    */
  def lut(vec: ArrayData, isFloat: Boolean): ArrayData = {
    if (vec == null || vec.numElements() != m * d) return null
    val out = new Array[Long](m * k)
    var mi = 0
    while (mi < m) {
      val vbase = mi * d
      var n2x = 0.0
      var i = 0
      while (i < d) {
        if (vec.isNullAt(vbase + i)) return null
        val x = if (isFloat) vec.getFloat(vbase + i).toDouble
                else vec.getDouble(vbase + i)
        n2x += x * x
        i += 1
      }
      var ki = 0
      while (ki < k) {
        val cbase = (mi * k + ki) * d
        var dot = 0.0
        i = 0
        while (i < d) {
          val x = if (isFloat) vec.getFloat(vbase + i).toDouble
                  else vec.getDouble(vbase + i)
          dot += x * flat(cbase + i)
          i += 1
        }
        val d2 = n2x - 2.0 * dot + n2c(mi * k + ki)
        out(mi * k + ki) = java.math.BigDecimal.valueOf(d2 * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
        ki += 1
      }
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object PqCodec {

  /** Asymmetric-distance sum: Σ_mi lut[mi·k + nibble(code, mi)] over
    * the per-probe micro-quantized LUT. Long arithmetic only — the LUT
    * entries were quantized ONCE (round(d2·1e6) as BIGINT), so the sum
    * is exact and partial-order-free, which is what makes the ADC
    * ranking cross-engine deterministic. Null on a malformed LUT
    * (length ≠ m·k, null slot) or an out-of-range nibble.
    */
  def adc(code: Long, lut: ArrayData, m: Int, k: Int): java.lang.Long = {
    if (lut == null || lut.numElements() != m * k) return null
    var sum = 0L
    var mi = 0
    while (mi < m) {
      val c = ((code >>> (4 * mi)) & 0xfL).toInt
      if (c >= k) return null
      val slot = mi * k + c
      if (lut.isNullAt(slot)) return null
      sum += lut.getLong(slot)
      mi += 1
    }
    java.lang.Long.valueOf(sum)
  }
}

/** `pq_encode(vec, book, dims)` → packed 64-bit PQ code. `book` is the
  * FOLDABLE flattened codebook array<double> (length m·k·d, row-major
  * (subspace, centroid, dim)); `dims` is the foldable array<int>
  * (m, k, d) — both folded once at plan time into the [[PqBook]]
  * reference object, never re-parsed per row.
  */
case class PqEncodeExpr(vec: Expression, book: Expression, dims: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = book
  override def third: Expression = dims

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  private def vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!vecOk) TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires a float/double array vector, got ${vec.dataType.catalogString}")
    else (book.dataType, dims.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _))
          if book.foldable && dims.foldable => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "pq_encode requires FOLDABLE book and dims (the codebook is " +
            "built once at plan time, not per row)")
      case (b, dm) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires (array<double> book, array<int> dims), got " +
          s"(${b.catalogString}, ${dm.catalogString})")
    }
  }

  @transient private lazy val pqBook: PqBook = {
    val dm = dims.eval(null).asInstanceOf[ArrayData]
    require(dm != null && dm.numElements() == 3,
      "pq_encode dims must be a non-null (m, k, d) int triple")
    require(!dm.isNullAt(0) && !dm.isNullAt(1) && !dm.isNullAt(2),
      "pq_encode dims must not contain nulls")
    val bk = book.eval(null).asInstanceOf[ArrayData]
    require(bk != null, "pq_encode book must not be null")
    val flat = new Array[Double](bk.numElements())
    var i = 0
    while (i < flat.length) {
      require(!bk.isNullAt(i), s"pq_encode book[$i] is null")
      flat(i) = bk.getDouble(i)
      i += 1
    }
    new PqBook(flat, dm.getInt(0), dm.getInt(1), dm.getInt(2))
  }

  override def nullSafeEval(v: Any, b: Any, dm: Any): Any =
    pqBook.encode(v.asInstanceOf[ArrayData], vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", pqBook, classOf[PqBook].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"""java.lang.Long r = $bookRef.encode($v, $vecIsFloat);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqEncodeExpr =
    copy(vec = newFirst, book = newSecond, dims = newThird)
}

/** `pq_lut(vec, book, dims)` → the probe's full ADC lookup table as
  * array<bigint> (slot = m·k + cid), computed row-locally — the
  * serving-path twin of q147's explode + keyed collect_list assembly
  * (PqServe: one codegen'd call per arriving probe, no shuffle).
  * `book`/`dims` are foldable, folded once at plan time into the same
  * [[PqBook]] reference object as pq_encode.
  */
case class PqLutExpr(vec: Expression, book: Expression, dims: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = book
  override def third: Expression = dims

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  private def vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!vecOk) TypeCheckResult.TypeCheckFailure(
      s"pq_lut requires a float/double array vector, got ${vec.dataType.catalogString}")
    else (book.dataType, dims.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _))
          if book.foldable && dims.foldable => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "pq_lut requires FOLDABLE book and dims (the codebook is " +
            "built once at plan time, not per row)")
      case (b, dm) => TypeCheckResult.TypeCheckFailure(
        s"pq_lut requires (array<double> book, array<int> dims), got " +
          s"(${b.catalogString}, ${dm.catalogString})")
    }
  }

  @transient private lazy val pqBook: PqBook = {
    val dm = dims.eval(null).asInstanceOf[ArrayData]
    require(dm != null && dm.numElements() == 3,
      "pq_lut dims must be a non-null (m, k, d) int triple")
    require(!dm.isNullAt(0) && !dm.isNullAt(1) && !dm.isNullAt(2),
      "pq_lut dims must not contain nulls")
    val bk = book.eval(null).asInstanceOf[ArrayData]
    require(bk != null, "pq_lut book must not be null")
    val flat = new Array[Double](bk.numElements())
    var i = 0
    while (i < flat.length) {
      require(!bk.isNullAt(i), s"pq_lut book[$i] is null")
      flat(i) = bk.getDouble(i)
      i += 1
    }
    new PqBook(flat, dm.getInt(0), dm.getInt(1), dm.getInt(2))
  }

  override def nullSafeEval(v: Any, b: Any, dm: Any): Any =
    pqBook.lut(v.asInstanceOf[ArrayData], vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", pqBook, classOf[PqBook].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"""org.apache.spark.sql.catalyst.util.ArrayData r =
         |  $bookRef.lut($v, $vecIsFloat);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqLutExpr =
    copy(vec = newFirst, book = newSecond, dims = newThird)
}

/** `pq_adc(code, lut, dims)` → exact long ADC distance. `lut` is the
  * per-probe array<long> of micro-quantized sub-distances ordered by
  * slot = m·k + cid (NOT foldable — it rides in from the broadcast
  * probe frame); `dims` is the foldable (m, k) int pair.
  */
case class PqAdcExpr(code: Expression, lut: Expression, dims: Expression)
    extends TernaryExpression {

  override def first: Expression = code
  override def second: Expression = lut
  override def third: Expression = dims

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (code.dataType, lut.dataType, dims.dataType) match {
      case (LongType, ArrayType(LongType, _), ArrayType(IntegerType, _))
          if dims.foldable => TypeCheckResult.TypeCheckSuccess
      case (LongType, ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "pq_adc requires FOLDABLE dims (m, k)")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (bigint code, array<bigint> lut, array<int> dims), got " +
          Seq(code, lut, dims).map(_.dataType.catalogString).mkString(", "))
    }

  @transient private lazy val (mVal, kVal) = {
    val dm = dims.eval(null).asInstanceOf[ArrayData]
    require(dm != null && dm.numElements() == 2,
      "pq_adc dims must be a non-null (m, k) int pair")
    require(!dm.isNullAt(0) && !dm.isNullAt(1),
      "pq_adc dims must not contain nulls")
    val m = dm.getInt(0)
    val k = dm.getInt(1)
    require(m >= 1 && m <= 16 && k >= 2 && k <= 16,
      s"pq_adc: (m=$m, k=$k) outside ([1,16], [2,16])")
    (m, k)
  }

  override def nullSafeEval(c: Any, l: Any, dm: Any): Any =
    PqCodec.adc(c.asInstanceOf[Long], l.asInstanceOf[ArrayData], mVal, kVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l, _) =>
      s"""java.lang.Long r = graft.functions.PqCodec.adc($c, $l, $mVal, $kVal);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqAdcExpr =
    copy(code = newFirst, lut = newSecond, dims = newThird)
}
