package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string column — a native Catalyst
  * Expression WITH codegen (SURVEY.md §2.3 T10), used for document
  * fingerprinting. h = Σ byte_i · B^i  (mod M), B = 257, M = 2^61 - 1.
  *
  * Why an Expression and not a UDF: doGenCode emits straight-line Java
  * into the generated stage, so fingerprinting 100 TB of text costs one
  * pass over the bytes with no boxing, no Scala-function dispatch, and no
  * codegen fence around the projection (a UDF would black-box the stage).
  */
case class RollingHashExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "rolling_hash"

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    RollingHashExpr.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashExpr.hashBytes($c.getBytes());")
}

/** Reverse-direction twin of [[RollingHashExpr]]: Σ byte_i · B^(n-1-i)
  * (a Horner fold over the bytes in forward order). Defined purely in
  * the BYTE domain — no string reversal — so the DuckDB twin is
  * byte-identical even for combining-character sequences where string
  * reverse() semantics differ between engines (code points vs grapheme
  * clusters).
  */
case class RollingHashRevExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash_rev requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "rolling_hash_rev"

  override protected def withNewChildInternal(newChild: Expression): RollingHashRevExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    RollingHashExpr.hashBytesRev(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashExpr.hashBytesRev($c.getBytes());")
}

object RollingHashExpr {
  final val Base = 257L
  final val Mod = (1L << 61) - 1 // Mersenne prime 2^61-1

  /** mulmod via 128-bit Math.multiplyHigh + Mersenne reduction — branch-
    * light, called from both interpreted eval and generated code.
    */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < bytes.length) {
      h = modAdd(h, mulMod(bytes(i) & 0xffL, pow))
      pow = mulMod(pow, Base)
      i += 1
    }
    h
  }

  /** Σ byte_i · B^(n-1-i) — Horner over the bytes in forward order. */
  def hashBytesRev(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = modAdd(mulMod(h, Base), bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // (hi,lo) is the 128-bit product; reduce mod 2^61-1:
    // value = lo mod 2^61 + (bits above 61) where above = (hi << 3) | (lo >>> 61)
    val low61 = lo & Mod
    val high = (hi << 3) | (lo >>> 61)
    modAdd(low61, high % Mod)
  }

  private def modAdd(a: Long, b: Long): Long = {
    val s = a + b
    if (s >= Mod) s - Mod else s
  }

  /** Column wrapper — resolves through the function registry, where
    * GraftExtensions injects this expression (the public
    * SparkSessionExtensions path; no private Catalyst API needed).
    */
  def rollingHash(c: Column): Column =
    org.apache.spark.sql.functions.call_function("rolling_hash", c)

  def rollingHashRev(c: Column): Column =
    org.apache.spark.sql.functions.call_function("rolling_hash_rev", c)
}
