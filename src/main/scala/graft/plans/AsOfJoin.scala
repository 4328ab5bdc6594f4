package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, NamedExpression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator extension point (SURVEY.md §3, ladder step c): a native
  * as-of join — custom LogicalPlan + SparkStrategy + SparkPlan, registered
  * through SparkSessionExtensions.injectPlannerStrategy.
  *
  * Semantics: for each left row, attach the selected columns of the LAST
  * right row with an equal key whose (time, seq) composite is <= the left
  * row's (time, seq) (lexicographic); nulls if none. The composite makes
  * the match total even under timestamp ties — seq is the deterministic
  * tiebreak, exactly the (ts, event_id) window order of the compositional
  * form (Relational.q10AsofJoin, the reference shape for
  * ExtractBrokerDealers.py-style "latest filing state at time t" lookups).
  *
  * Why a custom operator when q10 already composes it from a window over a
  * union: the composition shuffles the UNION of both sides and sorts it
  * once per window, and carries every left row through the max-window.
  * This plan shuffles each side by its own key, sorts each side, then
  * streams a zipPartitions MERGE — per partition O(L + R) with one right
  * buffer row of state, never materializing (left + right) rows together.
  * At 100 TB both sides stay co-partitioned (ClusteredDistribution), the
  * merge is single-pass, and AQE still plans both exchanges.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftOrd: Seq[Expression],
    rightOrd: Seq[Expression],
    rightValues: Seq[Expression],
    valueAttrs: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ valueAttrs

  override def producedAttributes: AttributeSet = AttributeSet(valueAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoin logical node -> AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lo, ro, rv, va) =>
      AsOfJoinExec(lk, rk, lo, ro, rv, va, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children are hash-clustered on the join keys
  * (EnsureRequirements co-partitions them, as for CoGroupExec) and sorted
  * by (keys, time, seq); the merge streams both sides once per partition,
  * holding only the latest-matching right values between left rows.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftOrd: Seq[Expression],
    rightOrd: Seq[Expression],
    rightValues: Seq[Expression],
    valueAttrs: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ valueAttrs

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys ++ leftOrd).map(SortOrder(_, Ascending)),
    (rightKeys ++ rightOrd).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys ++ leftOrd).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val ordTypes = leftOrd.map(_.dataType)
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lOrd = leftOrd; val rOrd = rightOrd
    val rVals = rightValues
    val outAttrs = output
    val nValues = valueAttrs.length
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      // projections/orderings are created per partition, on the executor
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lOrdProj = UnsafeProjection.create(lOrd, lOut)
      val rOrdProj = UnsafeProjection.create(rOrd, rOut)
      val valProj = UnsafeProjection.create(rVals, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyCmp = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val ordCmp = RowOrdering.createNaturalAscendingOrdering(ordTypes)
      val joined = new JoinedRow
      val nullValues = new GenericInternalRow(nValues)

      new Iterator[InternalRow] {
        private var rCur: InternalRow = if (rIt.hasNext) rIt.next() else null
        private var best: UnsafeRow = null // latest right values for bestKey
        private var bestKey: UnsafeRow = null

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val lk = lKeyProj(l) // reused buffer; copied only into bestKey
          if (bestKey != null && keyCmp.compare(bestKey, lk) != 0) {
            best = null; bestKey = null
          }
          val lo = lOrdProj(l)
          var scanning = true
          while (scanning && rCur != null) {
            val c = keyCmp.compare(rKeyProj(rCur), lk)
            if (c < 0) {
              // right key before any remaining left key: skip
              rCur = if (rIt.hasNext) rIt.next() else null
            } else if (c == 0 && ordCmp.compare(rOrdProj(rCur), lo) <= 0) {
              // match at-or-before: remember values, keep scanning (a later
              // right row may still be <= this left row)
              best = valProj(rCur).copy()
              if (bestKey == null) bestKey = lk.copy()
              rCur = if (rIt.hasNext) rIt.next() else null
            } else {
              scanning = false // right is beyond this left row; stop
            }
          }
          resultProj(joined(l, if (best != null) best else nullValues))
        }
      }
    }
  }
}

/** Public column-name API over the AsOfJoin plan. */
object AsOf {

  /** `left` gains `values` (rightCol -> outputName) from the last `right`
    * row with equal `on` key and (time, seq) at-or-before the left row's.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      on: Seq[(String, String)],
      time: (String, String),
      seq: (String, String),
      values: Seq[(String, String)]): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    // re-alias every right attribute: left and right often derive from the
    // same base relation (self as-of joins) and would otherwise carry
    // duplicate expression ids into the two children
    val rBase = right.queryExecution.analyzed
    val rAliases = rBase.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rBase)
    // resolve by name, mirroring Spark's AMBIGUOUS_REFERENCE behavior:
    // after a join either side can carry duplicate column names, and
    // silently binding the first match could pick the wrong key/time column
    def resolve(side: String, output: Seq[Attribute])(n: String): Attribute =
      output.filter(_.name == n) match {
        case Seq(a) => a
        case Seq() =>
          throw new IllegalArgumentException(s"$side column $n not found")
        case many =>
          throw new IllegalArgumentException(
            s"$side column $n is ambiguous: ${many.size} attributes match " +
              s"(${many.map(_.qualifiedName).mkString(", ")}); " +
              "alias the duplicates before AsOf.join")
      }
    val lAttr = resolve("left", lPlan.output) _
    val rAttr = resolve("right", rPlan.output) _
    // fail fast on type disagreement: the physical comparators are built
    // from LEFT-side types and read right-side rows with the same
    // accessors — mismatched widths would compare garbage, not error
    (on.map(p => (p, lAttr(p._1).dataType, rAttr(p._2).dataType)) :+
      ((time, lAttr(time._1).dataType, rAttr(time._2).dataType)) :+
      ((seq, lAttr(seq._1).dataType, rAttr(seq._2).dataType)))
      .foreach { case ((ln, rn), lt, rt) =>
        require(lt == rt,
          s"as-of column type mismatch: left $ln: $lt vs right $rn: $rt")
      }
    val valueAttrs = values.map { case (rn, outName) =>
      val a = rAttr(rn)
      AttributeReference(outName, a.dataType, nullable = true)()
    }
    val node = AsOfJoin(
      lPlan, rPlan,
      on.map(p => lAttr(p._1)), on.map(p => rAttr(p._2)),
      Seq(lAttr(time._1), lAttr(seq._1)),
      Seq(rAttr(time._2), rAttr(seq._2)),
      values.map(v => rAttr(v._1)),
      valueAttrs)
    Bridge.ofRows(left.sparkSession, node)
  }
}
