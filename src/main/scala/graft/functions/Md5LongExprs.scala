package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native forms of the engine's cross-engine 60-bit md5 hash (r14 —
  * the third Diag-guided fusion after norm_text and shingle_hash).
  *
  * `md5_long` is the scalar: MD5 digest → the first 15 hex digits'
  * value as a long, BIT-IDENTICAL to the declarative
  * `conv(substring(md5(c), 1, 15), 16, 10).cast(long)` — the first 15
  * hex digits are the digest's first 7 bytes followed by byte 7's high
  * nibble, folded big-endian. The declarative chain renders a 32-char
  * hex string, substrings it, and re-parses via NumberConverter; the
  * native form never leaves bytes.
  *
  * `md5_long_ngrams` fuses the n-gram variant the minhash family feeds:
  * per n-token window, digest over the concat_ws(" ")-equivalent byte
  * stream (separator 0x20, null elements skipped WITH their separator,
  * empty elements kept — concat_ws semantics exactly), no shingle
  * string ever materialized. This replaces q42's interpreted
  * `transform`-HOF string build + per-row hex chain: the id stream is
  * bit-identical, so the oracle twins (DuckDB `||`-joined shingles,
  * hex-prefix parse) are untouched.
  *
  * Md5LongSpec pins both against the declarative forms on adversarial
  * inputs and the corpus; every consumer is oracle-gated.
  */
case class Md5LongExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case s: StringType =>
      // r14 advice: the bare == StringType test rejected collated
      // strings with a message that never mentioned collation
      TypeCheckResult.TypeCheckFailure(
        "md5_long digests UTF8_BINARY strings only (its hex-prefix parity " +
          s"argument assumes binary collation); got ${s.catalogString}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_long requires a string argument, got ${other.catalogString}")
  }
  override def prettyName: String = "md5_long"

  override protected def withNewChildInternal(newChild: Expression): Md5LongExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    Md5LongExprs.md5Long(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5LongExprs.md5Long($c);")
}

case class Md5LongNgramsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.dataType == IntegerType && right.foldable =>
      // r14 advice: reject n <= 0 / null here, not only in the Column
      // wrapper's when(size>=n) guard — raw SQL reaches this directly
      right.eval() match {
        case n: Int if n >= 1 => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"md5_long_ngrams requires n >= 1, got ${Option(other).getOrElse("null")}")
      }
    case ArrayType(e: StringType, _) if e != StringType =>
      TypeCheckResult.TypeCheckFailure(
        "md5_long_ngrams digests UTF8_BINARY strings only (its hex-prefix " +
          s"parity argument assumes binary collation); got array<${e.catalogString}>")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"md5_long_ngrams requires (array<string>, foldable int), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def prettyName: String = "md5_long_ngrams"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5LongNgramsExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(toks: Any, n: Any): Any =
    Md5LongExprs.md5LongNgrams(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.Md5LongExprs.md5LongNgrams($t, $n);")
}

object Md5LongExprs {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of the digest as a non-negative long: bytes
    * 0..6 folded big-endian, then byte 7's HIGH nibble — exactly what
    * `conv(substring(hex, 1, 15), 16, 10)` parses.
    */
  private def fold60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  def md5Long(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    md.update(s.getBytes)
    fold60(md.digest())
  }

  /** Per n-token window: digest of the concat_ws(" ") byte stream —
    * null elements skipped with their separator, empties kept.
    */
  def md5LongNgrams(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return ArrayData.toArrayData(Array.emptyLongArray)
    val md = digests.get()
    // pre-fetch byte arrays once per token, not once per window
    val bytes = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i)) bytes(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      md.reset()
      var first = true
      var k = 0
      while (k < n) {
        val b = bytes(i + k)
        if (b != null) {
          if (!first) md.update(' '.toByte)
          first = false
          md.update(b)
        }
        k += 1
      }
      out(i) = fold60(md.digest())
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
