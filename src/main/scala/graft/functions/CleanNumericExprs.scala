package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd twins of [[CleanNumeric]]'s messy-generator and
  * cleaner (reference: OCRClean.py:30-88 `num_strip`).
  *
  * Why Expressions and not the previous pure-Column composition: the
  * declarative trees reference their sub-terms many times (`base` in six
  * CASE branches, the stripped string in ~8 regex steps), and Catalyst
  * inlines every reference. One cleaned column compiles; q103's two
  * messy columns + two conditional cleans + a window sort in one stage
  * blew Janino's 64 KB method limit, so the whole span lost whole-stage
  * codegen AND common-subexpression elimination and re-evaluated the
  * duplicated subtrees interpreted — the round-6 "q103 costs 55-160 s"
  * finding. Each expression here emits ONE static call into the
  * generated stage (the RollingHashExpr pattern): straight-line Java,
  * single pass per value, no tree duplication, no codegen fence. The
  * DuckDB oracle twins ([[CleanNumeric.messySqlExpr]] /
  * [[CleanNumeric.cleanSqlExpr]]) are unchanged — the helpers below
  * replicate the exact same arithmetic (same HALF_UP rounding, same
  * truncating casts, same last-period split), verified bit-for-bit by
  * the q22/q23/q103 oracle gate and CleanNumericSpec.
  */
case class MessyNumericExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"messy_numeric requires (double, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def prettyName: String = "messy_numeric"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MessyNumericExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(value: Any, key: Any): Any =
    CleanNumericExprs.messy(value.asInstanceOf[Double], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, k) =>
      s"${ev.value} = graft.functions.CleanNumericExprs.messy($v, $k);")
}

case class CleanNumericExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"clean_numeric requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "clean_numeric"

  override protected def withNewChildInternal(newChild: Expression): CleanNumericExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    CleanNumericExprs.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CleanNumericExprs.clean($c);")
}

object CleanNumericExprs {

  /** Messy generator — mirrors CleanNumeric.messySqlExpr exactly:
    * cents via ROUND(v*100, 0) HALF_UP, truncating integer divisions
    * (the SQL twin's `//` on non-negative values), manual comma
    * grouping, then the key%6 OCR variant.
    */
  def messy(value: Double, key: Long): UTF8String = {
    // round(value*100, 0) on a DOUBLE is BigDecimal.valueOf (toString-
    // based) + HALF_UP in both engines — with Spark's Round passing
    // NaN/Infinity through untouched (BigDecimal.valueOf would throw);
    // the cast to long then truncates (NaN -> 0, Inf -> Long.MaxValue,
    // the JVM's double->long conversion, same as Spark's non-ANSI Cast).
    // The corpus never feeds non-finite values, but the expression must
    // stay TOTAL like the Column chain it replaced (SURVEY §4).
    val scaled = value * 100
    val rounded =
      if (java.lang.Double.isNaN(scaled) || java.lang.Double.isInfinite(scaled)) scaled
      else JBigDecimal.valueOf(scaled).setScale(0, RoundingMode.HALF_UP).doubleValue()
    val cents = rounded.toLong
    val ip = (cents / 100.0).toLong // Column.divide is double division
    val fr = lpad(String.valueOf(cents % 100), 2)
    val g =
      if (ip >= 1000000L)
        s"${(ip / 1000000.0).toLong},${lpad(String.valueOf((ip / 1000.0).toLong % 1000), 3)},${lpad(String.valueOf(ip % 1000), 3)}"
      else if (ip >= 1000L)
        s"${(ip / 1000.0).toLong},${lpad(String.valueOf(ip % 1000), 3)}"
      else String.valueOf(ip)
    val base = g + "." + fr
    val out = (key % 6) match {
      case 0 => "$" + base
      case 1 => "(" + base + ")"
      case 2 => base.replace('1', 'I')
      case 3 => "  " + base + " "
      case 4 => "-"
      case _ => "-" + base.replace(",", "")
    }
    UTF8String.fromString(out)
  }

  // Spark's lpad: pads with '0' to len, and TRUNCATES to the first len
  // chars when the input is longer (a negative remainder's "-42" padded
  // to 2 is "-4", not "0-42") — matters only off-corpus, but parity is
  // the whole point of these helpers.
  private def lpad(s: String, len: Int): String =
    if (s.length >= len) s.substring(0, len)
    else ("0" * (len - s.length)) + s

  /** Cleaner — mirrors CleanNumeric.cleanSqlExpr exactly: trim spaces,
    * parens/leading-hyphen negative, I/l→1, keep [0-9.], split at the
    * LAST period (the greedy `^(.*)\.([^.]*)$`), 1-2 fractional digits
    * is a decimal point, otherwise periods were thousands separators.
    */
  def clean(raw: UTF8String): Double = {
    val s0 = raw.toString
    // trim SPACES only (Spark's trim), not Java's <= ' ' whitespace
    var b = 0
    var e = s0.length
    while (b < e && s0.charAt(b) == ' ') b += 1
    while (e > b && s0.charAt(e - 1) == ' ') e -= 1
    val s = s0.substring(b, e)
    val neg = s.startsWith("(") || (s.startsWith("-") && s != "-")
    // t = keep [0-9.] of TRANSLATE(s, 'Il', '11')
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      var c = s.charAt(i)
      if (c == 'I' || c == 'l') c = '1'
      if ((c >= '0' && c <= '9') || c == '.') sb.append(c)
      i += 1
    }
    val t = sb.toString
    val lastDot = t.lastIndexOf('.')
    var hasDigit = false
    i = 0
    while (i < t.length && !hasDigit) {
      if (t.charAt(i) != '.') hasDigit = true
      i += 1
    }
    val mag: Double =
      if (!hasDigit) 0.0
      else if (lastDot < 0) java.lang.Double.parseDouble(t)
      else {
        val decp = t.substring(lastDot + 1)
        val ic = t.substring(0, lastDot).replace(".", "")
        if (decp.length >= 1 && decp.length <= 2)
          java.lang.Double.parseDouble((if (ic.isEmpty) "0" else ic) + "." + decp)
        else {
          val s2 = ic + decp
          java.lang.Double.parseDouble(if (s2.isEmpty) "0" else s2)
        }
      }
    if (neg) -mag else mag
  }
}
