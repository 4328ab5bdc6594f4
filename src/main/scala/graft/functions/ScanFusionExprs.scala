package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fact-scan map-stage fusions found by InterpretedGuardSpec (r15 — the
  * r14 Diag audit turned into a gate, and its first sweep flagged these
  * two surviving interpreted HOFs on corpus-proportional paths):
  *
  *   - `token_hits(text, words)`: the stopword counter behind language
  *     ID (q47), quality scoring (q48) and every quality consumer
  *     (q118/q124/q126/q127/q133/q137). Declarative form was
  *     `size(filter(split(text,' '), t -> t IN (...)))` — an
  *     interpreted lambda with ~10 boxed equality tests per token, per
  *     language, per document. Here: one byte scan, one hash probe per
  *     token.
  *   - `sig_agree(sig1, sig2)`: minhash signature agreement on q42's
  *     candidate-pair verify step. Declarative form was
  *     `size(filter(zip_with(sig1, sig2, (x,y) -> x = y), b -> b))` —
  *     three interpreted lambda layers materializing two intermediate
  *     arrays per pair. Here: one fused primitive loop.
  *
  * Both keep their declarative twins (private[graft], spec-pinned
  * bit-equal) and their DuckDB oracle SQL untouched — the native-parity
  * discipline from NormTextExpr/ShingleHashExpr.
  */
object ScanFusionExprs {

  /** Sliding-window sums (see [[WindowSumsExpr]]): windows start at
    * k·s, cover up to c elements, and the count is
    * 1 + max(0, ceil((n − c)/s)) for n > 0 — every element is covered,
    * the last window may be short. Null element poisons to null.
    */
  def windowSums(arr: ArrayData, c: Int, s: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return ArrayData.toArrayData(Array.emptyLongArray)
    val nw = 1 + math.max(0L, (n - c + s - 1L) / s).toInt
    val out = new Array[Long](nw)
    var k = 0
    while (k < nw) {
      val from = k * s
      val to = math.min(from + c, n)
      var acc = 0L
      var i = from
      while (i < to) {
        if (arr.isNullAt(i)) return null
        acc += arr.getLong(i)
        i += 1
      }
      out(k) = acc
      k += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Tokens between single 0x20 bytes (split(text,' ') semantics —
    * empty segments occur but can never match a non-empty stopword),
    * counted against the set with zero-copy UTF8String slices.
    */
  def countHits(text: UTF8String, set: java.util.HashSet[UTF8String]): Int = {
    val bytes = text.getBytes
    var hits = 0
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start && set.contains(UTF8String.fromBytes(bytes, start, i - start))) {
          hits += 1
        }
        start = i + 1
      }
      i += 1
    }
    hits
  }

  /** Non-empty tokens between single 0x20 bytes — the fused form of
    * `filter(split(text,' '), t -> length(t) > 0)` (q133/q137's
    * held-out tokenizer, where explode_outer must see an EMPTY array
    * for an all-space doc so the doc still scores).
    */
  def splitWords(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](8)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) out += UTF8String.fromBytes(bytes, start, i - start)
        start = i + 1
      }
      i += 1
    }
    ArrayData.toArrayData(out.toArray)
  }

  /** Positions where both signatures are non-null and equal —
    * zip_with's null-padding for unequal lengths contributes nothing,
    * matching the declarative form's null-comparison drop.
    */
  def sigAgree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) agree += 1
      i += 1
    }
    agree
  }
}

/** Count of space-split tokens of `left` that are members of the
  * foldable word list `right`.
  */
case class TokenHitsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(StringType, _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "token_hits requires (string, foldable array<string>) in UTF8_BINARY " +
        s"collation, got (${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def prettyName: String = "token_hits"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenHitsExpr =
    copy(left = newLeft, right = newRight)

  // built once per expression instance from the foldable word list;
  // UTF8String.clone() detaches the entries from the literal's buffer
  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    val s = new java.util.HashSet[UTF8String](math.max(4, arr.numElements() * 2))
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i).clone())
      i += 1
    }
    s
  }

  override def nullSafeEval(text: Any, words: Any): Any =
    ScanFusionExprs.countHits(text.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwordSet", wordSet,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.ScanFusionExprs.countHits($t, $setRef);")
  }
}

/** Non-empty space-split tokens of a document. */
case class SplitWordsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"split_words requires a UTF8_BINARY string argument, got ${other.catalogString}")
  }
  override def prettyName: String = "split_words"

  override protected def withNewChildInternal(newChild: Expression): SplitWordsExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    ScanFusionExprs.splitWords(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ScanFusionExprs.splitWords($c);")
}

/** Count of positions where two long signatures agree. */
case class SigAgreeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "sig_agree requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def prettyName: String = "sig_agree"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreeExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    ScanFusionExprs.sigAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ScanFusionExprs.sigAgree($a, $b);")
}

/** `window_sums(arr, c, s)` → array<bigint> of sliding-window sums
  * over a long array: entry k = Σ arr[k·s ... min(k·s+c, n)−1], with
  * n_windows = 1 + max(0, ceil((n − c)/s)) for n > 0 and an EMPTY
  * array for n = 0 — exactly q150's overlapping-chunk grid, computed
  * row-locally so the chunk billing needs no aggregation exchange at
  * all (the groupBy form shuffled ~2 membership rows per corpus word).
  * `c`/`s` are foldable ints with c >= s >= 1. Null array → null;
  * null element → null (poison).
  */
case class WindowSumsExpr(arr: Expression, c: Expression, s: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = arr
  override def second: Expression = c
  override def third: Expression = s

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "window_sums"

  override def checkInputDataTypes(): TypeCheckResult =
    (arr.dataType, c.dataType, s.dataType) match {
      case (ArrayType(LongType, _), IntegerType, IntegerType)
          if c.foldable && s.foldable =>
        (c.eval(), s.eval()) match {
          case (cv: Int, sv: Int) if sv >= 1 && cv >= sv =>
            TypeCheckResult.TypeCheckSuccess
          case (cv, sv) => TypeCheckResult.TypeCheckFailure(
            s"window_sums requires c >= s >= 1, got (c=$cv, s=$sv)")
        }
      case (ArrayType(LongType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckFailure(
          "window_sums requires FOLDABLE (c, s) window/stride ints")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"window_sums requires (array<bigint>, int, int), got " +
          Seq(arr, c, s).map(_.dataType.catalogString).mkString(", "))
    }

  @transient private lazy val (cv, sv) =
    (c.eval().asInstanceOf[Int], s.eval().asInstanceOf[Int])

  override def nullSafeEval(a: Any, cc: Any, ss: Any): Any =
    ScanFusionExprs.windowSums(a.asInstanceOf[ArrayData], cv, sv)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _) =>
      s"""org.apache.spark.sql.catalyst.util.ArrayData r =
         |  graft.functions.ScanFusionExprs.windowSums($a, $cv, $sv);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): WindowSumsExpr =
    copy(arr = newFirst, c = newSecond, s = newThird)
}
