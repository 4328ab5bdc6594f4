package graft.functions

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding codec: the shared merge table, the reference
  * apply/train loops, and the per-word cache behind the `bpe_count` /
  * `bpe_tokens` expressions (SURVEY §2.3 T42/T43; round-14 verdict
  * next-round #1 — T9 estimates tokens by whitespace regex, but a
  * production LLM-data pipeline bills shard budgets in TOKENIZER
  * tokens; reference analog: the reference's notebooks count words the
  * same estimated way, so this is an engine-beyond-reference operator
  * like the dedup family).
  *
  * SEMANTICS (identical in the engine, the local reference trainer, and
  * the DuckDB oracle twins — the three are never allowed to drift):
  *   - a document splits into words on single 0x20 bytes, empty
  *     segments dropped (`string_split(text,' ')` + `w <> ''`);
  *   - a word initializes as its Unicode-codepoint strings;
  *   - APPLY repeatedly merges the LEFTMOST occurrence of the
  *     LOWEST-RANK adjacent pair present, until no pair is in the
  *     table. (For tables produced by training this equals the
  *     merge-all-occurrences GPT-2 loop; we pin the leftmost-single
  *     form because it is the one the recursive-CTE oracle replays
  *     step-for-step.)
  *   - TRAIN counts every adjacent position (overlaps included) of
  *     every pair, weighted by word frequency; the winner per round is
  *     (count DESC, lhs ASC, rhs ASC) — equivalently (count DESC,
  *     pairKey ASC) since the \u0001 key separator sorts below every
  *     corpus byte — and is then merged at ALL its occurrences,
  *     left-to-right, in every word.
  *
  * Tokens must not contain \u0001 (key separator here, token boundary
  * in the oracle's string representation) — true for any corpus the
  * engine ingests as text; the trainer's pair keys would otherwise be
  * ambiguous.
  */
object BpeCodec {

  /** Key separator inside pair keys: sorts below every printable byte,
    * so pairKey byte-order == (lhs, rhs) lexicographic order.
    */
  val Sep = '\u0001'

  /** Fixture corpus for the FROZEN apply-side merges table: the
    * synthetic generator's 31-word vocabulary (GenScale.scala:42) at
    * equal weight. Self-contained — the frozen table never depends on
    * driver testdata, only on this literal.
    */
  private[graft] val FixtureWords: Seq[(String, Long)] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window"
  ).map(_ -> 1L)

  val FrozenRounds = 16

  /** Split into Unicode codepoint strings (DuckDB substr/length are
    * codepoint-based; String.split("") would shear surrogate pairs).
    */
  def codepoints(word: String): Array[String] = {
    val out = new ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Merge ALL occurrences of (lhs, rhs), left-to-right, one pass.
    * For a single pair this equals repeated leftmost-merge: the merged
    * token lhs+rhs is strictly longer than lhs and rhs, so no new
    * occurrence of the SAME pair can form around it.
    */
  def mergeAll(toks: Array[String], lhs: String, rhs: String): Array[String] = {
    val out = new ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == lhs && toks(i + 1) == rhs) {
        out += lhs + rhs; i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toArray
  }

  /** Reference trainer — the exact loop q141's distributed form runs,
    * shrunk to a Seq. Kept local so BpeSpec can pin distributed ==
    * local on the fixture, and so the frozen table is reproducible
    * from this file alone.
    */
  def trainLocal(words: Seq[(String, Long)], rounds: Int): Seq[(String, String)] = {
    var state = words.map { case (w, f) => (codepoints(w), f) }
    val out = ArrayBuffer.empty[(String, String)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (toks, f) =>
        var i = 0
        while (i < toks.length - 1) {
          val k = (toks(i), toks(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (lhs, rhs) = counts.toSeq.minBy { case ((l, rr), c) => (-c, l, rr) }._1
        out += ((lhs, rhs))
        state = state.map { case (toks, f) => (mergeAll(toks, lhs, rhs), f) }
        r += 1
      }
    }
    out.toSeq
  }

  /** PRODUCTION-DEPTH local trainer: bit-identical merges to
    * [[trainLocal]] (BpeSpec pins the parity at depth), but with
    * incremental pair-count maintenance instead of a full vocabulary
    * re-scan per round — the HF-tokenizers training shape. trainLocal
    * costs O(rounds × Σ|word|): at a production vocabulary (32k–100k
    * merges) over a 100 TB corpus's word table that is hours of
    * re-counting for counts that barely change. Here each merge
    * updates ONLY the words containing the winning pair (tracked in an
    * inverted pair→words index), and the per-round argmax comes from a
    * lazily-invalidated priority queue — every count mutation pushes a
    * fresh entry, stale entries are discarded against the live count
    * map on pop, so the top valid entry is always the true
    * (count DESC, lhs ASC, rhs ASC) winner. Cost per round is
    * O(occurrences of the winner + log P), sub-linear in vocabulary.
    */
  def trainLocalFast(words: Seq[(String, Long)], rounds: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val n = words.size
    val toks = new Array[Array[String]](n)
    val freq = new Array[Long](n)
    words.zipWithIndex.foreach { case ((w, f), i) =>
      toks(i) = codepoints(w); freq(i) = f
    }
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def pairBag(ts: Array[String]): mutable.HashMap[(String, String), Long] = {
      val m = mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < ts.length - 1) {
        val k = (ts(i), ts(i + 1))
        m.update(k, m.getOrElse(k, 0L) + 1L)
        i += 1
      }
      m
    }
    // preferred = larger count, then SMALLER (lhs, rhs) — dequeue-max
    // order for the PQ, the exact trainLocal minBy((-c, l, r)) key
    val ord = Ordering.fromLessThan[(Long, String, String)] { (a, b) =>
      if (a._1 != b._1) a._1 < b._1
      else if (a._2 != b._2) a._2 > b._2
      else a._3 > b._3
    }
    val pq = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    var wi = 0
    while (wi < n) {
      pairBag(toks(wi)).foreach { case (k, c) =>
        counts.update(k, counts.getOrElse(k, 0L) + c * freq(wi))
        where.getOrElseUpdate(k, mutable.HashSet.empty) += wi
      }
      wi += 1
    }
    counts.foreach { case ((l, r), c) => pq.enqueue((c, l, r)) }
    val out = ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < rounds && pq.nonEmpty) {
      val (c, l, r) = pq.dequeue()
      if (counts.get((l, r)).contains(c)) { // live entry — the winner
        out += ((l, r))
        val members = where.getOrElse((l, r), mutable.HashSet.empty).toArray
        var j = 0
        while (j < members.length) {
          val w = members(j)
          val before = pairBag(toks(w))
          toks(w) = mergeAll(toks(w), l, r)
          val after = pairBag(toks(w))
          (before.keySet ++ after.keySet).foreach { k =>
            val delta = after.getOrElse(k, 0L) - before.getOrElse(k, 0L)
            if (delta != 0L) {
              val nc = counts.getOrElse(k, 0L) + delta * freq(w)
              if (nc <= 0L) { counts.remove(k); where.remove(k) }
              else {
                counts.update(k, nc)
                pq.enqueue((nc, k._1, k._2))
              }
            }
            if (after.contains(k))
              where.getOrElseUpdate(k, mutable.HashSet.empty) += w
            else where.get(k).foreach(_ -= w)
          }
          j += 1
        }
        counts.remove((l, r)); where.remove((l, r))
        round += 1
      } // else: stale PQ entry, discard
    }
    out.toSeq
  }

  /** The frozen merges table `bpe_count`/`bpe_tokens` apply (rank =
    * position). Deterministic: trained from FixtureWords at object
    * init; BpeSpec pins the literal contents so a drift in the trainer
    * is caught, not silently re-frozen.
    */
  val Merges: Seq[(String, String)] = trainLocal(FixtureWords, FrozenRounds)

  /** The frozen table as a [[BpeTable]] — the apply loop and the
    * per-word cache live there so `bpe_count_with` (q144's dynamic,
    * corpus-trained table) shares the exact same semantics and hot
    * path instead of a second copy of the loop.
    */
  val frozen: BpeTable = new BpeTable(Merges)

  /** APPLY under the frozen table: leftmost occurrence of the
    * lowest-rank pair, until none present.
    */
  def encode(word: String): Array[String] = frozen.encode(word)

  /** Whole-document token count under the frozen table (see
    * [[BpeTable.countTokens]]).
    */
  def countTokens(text: UTF8String): Long = frozen.countTokens(text)

  def wordCounts(text: UTF8String): ArrayData = frozen.wordCounts(text)

  def tokensAsArrayData(word: UTF8String): ArrayData =
    ArrayData.toArrayData(encode(word.toString).map(UTF8String.fromString))

  /** Pair keys (lhs\u0001rhs) for every adjacent position — the
    * trainer's explode input. Null elements (never produced by split,
    * but type-possible) are skipped with both their pairs.
    */
  def pairKeys(toks: ArrayData): ArrayData = {
    val m = toks.numElements()
    val out = new ArrayBuffer[UTF8String](math.max(0, m - 1))
    var i = 0
    while (i < m - 1) {
      if (!toks.isNullAt(i) && !toks.isNullAt(i + 1)) {
        out += UTF8String.fromString(
          toks.getUTF8String(i).toString + Sep + toks.getUTF8String(i + 1).toString)
      }
      i += 1
    }
    ArrayData.toArrayData(out.toArray)
  }

  def mergePair(toks: ArrayData, lhs: UTF8String, rhs: UTF8String): ArrayData = {
    val m = toks.numElements()
    val out = new ArrayBuffer[UTF8String](m)
    var i = 0
    while (i < m) {
      if (i < m - 1 && !toks.isNullAt(i) && !toks.isNullAt(i + 1) &&
          toks.getUTF8String(i) == lhs && toks.getUTF8String(i + 1) == rhs) {
        out += UTF8String.concat(lhs, rhs); i += 2
      } else {
        out += (if (toks.isNullAt(i)) null else toks.getUTF8String(i)); i += 1
      }
    }
    ArrayData.toArrayData(out.toArray)
  }

  def codepointsAsArrayData(word: UTF8String): ArrayData =
    ArrayData.toArrayData(codepoints(word.toString).map(UTF8String.fromString))

  private[graft] def binaryStringCheck(name: String, dt: DataType): TypeCheckResult =
    dt match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case s: StringType => TypeCheckResult.TypeCheckFailure(
        s"$name operates on UTF8_BINARY strings only (oracle parity assumes " +
          s"binary collation); got ${s.catalogString}")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires a string argument, got ${other.catalogString}")
    }
}

/** A merges table with the reference apply semantics (leftmost
  * occurrence of the lowest-rank pair until none present) and a
  * bounded per-word count cache. One instance per table: the frozen
  * fixture table is [[BpeCodec.frozen]]; q144 builds one from its
  * corpus-trained merges and ships it to tasks as a codegen reference
  * object. The cache is capped so an adversarial corpus of unique
  * words cannot grow it unboundedly — misses just re-encode.
  */
final class BpeTable(merges: Seq[(String, String)]) extends Serializable {
  import BpeCodec.Sep

  private val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](math.max(4, merges.size * 2))
    merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + Sep + r, Integer.valueOf(i)) }
    m
  }

  def encode(word: String): Array[String] = {
    var toks = BpeCodec.codepoints(word)
    var done = toks.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.get(toks(i) + Sep + toks(i + 1))
        if (r != null && r.intValue < bestRank) { bestRank = r.intValue; bestI = i }
        i += 1
      }
      if (bestI < 0) done = true
      else {
        val nt = new Array[String](toks.length - 1)
        System.arraycopy(toks, 0, nt, 0, bestI)
        nt(bestI) = toks(bestI) + toks(bestI + 1)
        System.arraycopy(toks, bestI + 2, nt, bestI + 1, toks.length - bestI - 2)
        toks = nt
        done = toks.length < 2
      }
    }
    toks
  }

  private val CacheCap = 1 << 16
  @transient private lazy val countCache = new ConcurrentHashMap[String, java.lang.Long](4096)

  private def countWord(w: String): Long = {
    val hit = countCache.get(w)
    if (hit != null) hit.longValue
    else {
      val n = encode(w).length.toLong
      if (countCache.size < CacheCap) countCache.put(w, java.lang.Long.valueOf(n))
      n
    }
  }

  /** Whole-document token count: split on single 0x20 bytes (byte-safe
    * in UTF-8 — 0x20 never occurs as a continuation byte), skip empty
    * segments, sum cached per-word BPE lengths. One byte scan plus one
    * String per word; the BPE loop itself amortizes through the cache
    * (a Heaps-vocabulary corpus hits ~100%).
    */
  def countTokens(text: UTF8String): Long = {
    val bytes = text.getBytes
    var total = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) {
          total += countWord(new String(bytes, start, i - start, StandardCharsets.UTF_8))
        }
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** Per-word BPE lengths in document order — the same split loop as
    * [[countTokens]] emitting each word's cached count instead of the
    * sum, so `list_sum(word_counts) == countTokens` by construction.
    * The row-local feeder for shuffle-free chunking (q150 v2).
    */
  def wordCounts(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val out = new ArrayBuffer[Long]()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) {
          out += countWord(new String(bytes, start, i - start, StandardCharsets.UTF_8))
        }
        start = i + 1
      }
      i += 1
    }
    ArrayData.toArrayData(out.toArray)
  }
}

/** BPE token count of a whole document under the frozen merges table —
  * the real-tokenizer twin of q49's whitespace estimate. Codegen is a
  * static call, so the expression stays inside whole-stage codegen like
  * norm_text/shingle_hash.
  */
case class BpeCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    BpeCodec.binaryStringCheck("bpe_count", child.dataType)
  override def prettyName: String = "bpe_count"
  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    BpeCodec.countTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeCodec.countTokens($c);")
}

/** BPE tokens of ONE word under the frozen table (spec/debug surface —
  * the oracle gate checks counts; this makes the tokenization itself
  * inspectable from SQL).
  */
case class BpeTokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    BpeCodec.binaryStringCheck("bpe_tokens", child.dataType)
  override def prettyName: String = "bpe_tokens"
  override protected def withNewChildInternal(newChild: Expression): BpeTokensExpr =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    BpeCodec.tokensAsArrayData(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeCodec.tokensAsArrayData($c);")
}

/** Unicode-codepoint split — the trainer's word initializer. */
case class CodepointsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    BpeCodec.binaryStringCheck("codepoints", child.dataType)
  override def prettyName: String = "codepoints"
  override protected def withNewChildInternal(newChild: Expression): CodepointsExpr =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    BpeCodec.codepointsAsArrayData(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeCodec.codepointsAsArrayData($c);")
}

/** Adjacent pair keys (lhs\u0001rhs) of a token array — one native pass,
  * no HOF lambda frames on the trainer's per-round explode.
  */
case class TokenPairsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(e: StringType, _) if e != StringType =>
      TypeCheckResult.TypeCheckFailure(
        s"token_pairs operates on UTF8_BINARY tokens only; got array<${e.catalogString}>")
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_pairs requires array<string>, got ${other.catalogString}")
  }
  override def prettyName: String = "token_pairs"
  override protected def withNewChildInternal(newChild: Expression): TokenPairsExpr =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    BpeCodec.pairKeys(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeCodec.pairKeys($c);")
}

/** Merge every (lhs, rhs) occurrence left-to-right — the trainer's
  * per-round state update. The pair is driver-chosen per round and
  * rides as foldable string children, so the function is SQL-callable
  * like the rest of the family.
  */
case class MergePairExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(StringType, _)
        if second.dataType == StringType && second.foldable &&
          third.dataType == StringType && third.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "merge_pair requires (array<string>, foldable string, foldable string), got (" +
        s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
        s"${third.dataType.catalogString})")
  }
  override def prettyName: String = "merge_pair"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MergePairExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def nullSafeEval(toks: Any, lhs: Any, rhs: Any): Any =
    BpeCodec.mergePair(toks.asInstanceOf[ArrayData],
      lhs.asInstanceOf[UTF8String], rhs.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, l, r) =>
      s"${ev.value} = graft.functions.BpeCodec.mergePair($t, $l, $r);")
}

/** BPE token count under a DYNAMIC merges table — the q144 apply side
  * of the train→apply chain. The table rides as a foldable
  * array<string> of rank-ordered pair keys (lhs + U+0001 + rhs), is folded
  * ONCE at plan time into a [[BpeTable]], and ships to tasks as a
  * codegen reference object — so per-row cost is identical to the
  * frozen `bpe_count` (cached word lookups inside whole-stage codegen),
  * and the trained table never re-parses per row.
  */
case class BpeCountWithExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    val textOk = BpeCodec.binaryStringCheck("bpe_count_with", left.dataType)
    if (textOk != TypeCheckResult.TypeCheckSuccess) textOk
    else right.dataType match {
      case ArrayType(StringType, _) if right.foldable => TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
        "bpe_count_with requires a FOLDABLE merges array (the table is " +
          "built once at plan time, not per row)")
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_count_with requires array<string> merges (rank-ordered " +
          s"lhs\\u0001rhs pair keys), got ${other.catalogString}")
    }
  }
  override def prettyName: String = "bpe_count_with"

  @transient private lazy val table: BpeTable = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    require(arr != null, "bpe_count_with merges array must not be null")
    val merges = (0 until arr.numElements()).map { i =>
      require(!arr.isNullAt(i), s"bpe_count_with merges[$i] is null")
      val pk = arr.getUTF8String(i).toString
      val cut = pk.indexOf(BpeCodec.Sep.toInt)
      require(cut > 0 && pk.indexOf(BpeCodec.Sep.toInt, cut + 1) < 0,
        s"bpe_count_with merges[$i] must be lhs\\u0001rhs with non-empty lhs, got '$pk'")
      (pk.substring(0, cut), pk.substring(cut + 1))
    }
    new BpeTable(merges)
  }

  override def nullSafeEval(text: Any, merges: Any): Any =
    table.countTokens(text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $tableRef.countTokens($t);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeCountWithExpr =
    copy(left = newLeft, right = newRight)
}

/** `bpe_word_counts(text)` → array<bigint> of per-word BPE token
  * counts in document order (same single-0x20 empty-dropping split and
  * word cache as `bpe_count`, whose value equals this array's sum by
  * construction — BpeSpec pins it). The row-local feeder that lets
  * q150's overlapping-chunk billing run with ZERO aggregation
  * exchange: chunk sums compute inside the same projection via
  * `window_sums`.
  */
case class BpeWordCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    BpeCodec.binaryStringCheck("bpe_word_counts", child.dataType)
  override def prettyName: String = "bpe_word_counts"
  override protected def withNewChildInternal(newChild: Expression): BpeWordCountsExpr =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    BpeCodec.wordCounts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeCodec.wordCounts($c);")
}
