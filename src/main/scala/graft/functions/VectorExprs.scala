package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd twin of [[VectorFunctions]]'s sequential dot fold
  * (the CleanNumericExprs playbook, SURVEY §3 ladder step (b)).
  *
  * Why: `aggregate(zip_with(a, b, ...), 0.0, _ + _)` is semantically
  * right but runs as an interpreted higher-order function — a lambda
  * dispatch per element plus a materialized intermediate array per
  * row — and every REFERENCE to it in a cosine (numerator + two norms
  * + the null guard) duplicates that work. This expression emits ONE
  * static call that folds the two arrays in index order with double
  * arithmetic — the exact same sequence of IEEE operations, verified
  * bit-for-bit against the HOF form by VectorExprsSpec and by the
  * oracle gate (the DuckDB twins are unchanged).
  *
  * Null semantics mirror the HOF chain exactly: null array → null
  * (nullSafeEval); mismatched lengths → null (zip_with pads with null,
  * null product poisons the sum); any null ELEMENT → null.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two float/double array arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.dotBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Double r = graft.functions.VectorExprs.dotBoxed(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
         |""".stripMargin
    })
}

/** Native twin of the SPARSE dot fold
  * `aggregate(entries, 0.0, (a, e) => a + e.w * element_at(dense, e.dim))`
  * (q105/q108's k-means assignment inner loop): entries is an array of
  * (dim, w) structs with 1-BASED dims, dense is the broadcast centroid
  * array. Same left fold, same IEEE order. Null semantics mirror the
  * HOF chain (null struct/field/element poisons to null); an
  * out-of-range dim returns null where ANSI element_at would raise —
  * unreachable on-corpus (dims come from the vocabulary that built the
  * centroids) and documented here for the parity record.
  */
case class SparseDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.types.{IntegerType, StructType}

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sparse_dot"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(s: StructType, _), ArrayType(FloatType | DoubleType, _))
        if s.length == 2 && s.head.dataType == IntegerType &&
          s(1).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sparse_dot requires (array<struct<int,double>>, array<float|double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  private def denseFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SparseDotExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(e: Any, d: Any): Any =
    VectorExprs.sparseDotBoxed(e.asInstanceOf[ArrayData],
      d.asInstanceOf[ArrayData], denseFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, d) => {
      s"""java.lang.Double r = graft.functions.VectorExprs.sparseDotBoxed(
         |  $e, $d, $denseFloat);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
         |""".stripMargin
    })
}

/** Native elementwise residual `vec_sub(a, b)` → array<double> of
  * a(i) − b(i) (q147's IVFADC residual, SURVEY §2.3 T49). Each
  * element is ONE IEEE double subtraction — the DuckDB twin is
  * `CAST(a[i] AS DOUBLE) − b[i]` per dim, bit-identical — so the
  * residual-PQ chain built on top stays oracle-checkable. The
  * declarative form would be a zip_with lambda per corpus row (the
  * exact interpreted-HOF defect class InterpretedGuardSpec gates);
  * this is one static call inside whole-stage codegen.
  *
  * Null semantics mirror the HOF chain: null array → null
  * (nullSafeEval); length mismatch → null; any null element → null.
  */
case class VecSubExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sub"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sub requires two float/double array arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSubExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.subBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""org.apache.spark.sql.catalyst.util.ArrayData r =
         |  graft.functions.VectorExprs.subBoxed(
         |    $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
         |""".stripMargin
    })
}

object VectorExprs {

  /** Elementwise a(i) − b(i) in double; null on length mismatch or a
    * null element (the zip_with chain's outcomes).
    */
  def subBoxed(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): ArrayData = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      out(i) = x - y
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Strict left fold Σ a(i)·b(i) in index order, double arithmetic —
    * the same IEEE sequence as aggregate(zip_with(...)). Boxed so the
    * HOF chain's null outcomes (length mismatch, null element) are
    * representable.
    */
  def dotBoxed(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Strict left fold Σ w_i · dense(dim_i − 1) over 1-based sparse
    * entries, index order, double arithmetic — the same IEEE sequence
    * as the HOF chain it replaces.
    */
  def sparseDotBoxed(entries: ArrayData, dense: ArrayData,
      denseFloat: Boolean): java.lang.Double = {
    val n = entries.numElements()
    val m = dense.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (entries.isNullAt(i)) return null
      val row = entries.getStruct(i, 2)
      if (row.isNullAt(0) || row.isNullAt(1)) return null
      val dim = row.getInt(0)
      if (dim < 1 || dim > m || dense.isNullAt(dim - 1)) return null
      val x = if (denseFloat) dense.getFloat(dim - 1).toDouble
        else dense.getDouble(dim - 1)
      acc += row.getDouble(1) * x
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
