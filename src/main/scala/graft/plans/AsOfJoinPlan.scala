package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of (point-in-time) join — the whole-operator extension
  * route the composition in operators/AsOfJoin.scala avoids: a custom
  * LogicalPlan node, a SparkStrategy planning it, and a SparkPlan
  * that merges the two sorted streams in ONE pass per partition.
  * Registered through SparkSessionExtensions (GraftExtensions).
  *
  * Semantics (identical to AsOfJoin.asOf and to DuckDB's
  * `ASOF LEFT JOIN ... ON key = key AND lt >= rt`): for each left
  * row, the right row with equal key and the greatest time ≤ the
  * left time; at ties on (key, time) the greatest payload wins
  * (the composition's deterministic tie-break); no match → null
  * payload. Null keys and null times never match, on either side.
  *
  * Why a physical operator when the composition already runs in one
  * shuffle: the union+window form materializes every right row
  * THROUGH the window frame and carries a side tag and padded null
  * columns through the exchange; the native exec shuffles each side
  * as-is, holds exactly ONE buffered right row per partition, and
  * streams left rows straight to output — strictly less exchange
  * payload and no window state. The plan shape under EnsureRequirements
  * is two exchanges + two sorts (the sort-merge-join minimum).
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    payload: Seq[Expression], payloadAttrs: Seq[Attribute])
    extends BinaryNode {

  // pre-baked output attributes, NOT aliases: analyzer rules like
  // CleanupAliases strip non-top-level aliases inside any node that
  // is not Project/Aggregate/Window, which would silently rename the
  // payload columns and churn their exprIds on every copy
  override def output: Seq[Attribute] = left.output ++ payloadAttrs

  // payloadAttrs ride in the case-class product, so without this the
  // analyzer counts them as REFERENCED attributes missing from the
  // children (the Generate-style produced-not-consumed hook)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadAttrs)

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, p, pa) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, p, pa) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    payload: Seq[Expression], payloadAttrs: Seq[Attribute])
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadAttrs

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Both children sorted by (keys…, time); the right side further by
    * payload so "last right row at an eligible time" is the
    * deterministic greatest-payload tie-break, not shuffle order.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) ++
        (SortOrder(rightTime, Ascending) +:
          payload.map(p => SortOrder(p, Ascending))))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val payloadB = payload
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeysB.map(_.dataType))
      val timeOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(lTimeB.dataType))
      // the binding schema presents every right attribute as
      // NULLABLE: a miss projects the all-null row, and a payload
      // column that is non-nullable on the right child would
      // otherwise bind to a BoundReference that skips the null check
      // and emits garbage zeros (the classic outer-join trap)
      val resultProj = UnsafeProjection.create(
        (lOut: Seq[Expression]) ++ payloadB,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // current right cursor row (null = exhausted) with its key and
        // time projected ONCE per advance — the merge loop's
        // comparisons run on these cached copies, not re-projections
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTime: InternalRow = _
        advanceRight()
        // best (greatest (time, payload)) right row seen for the
        // CURRENT key whose time was ≤ some processed left time;
        // stored as copies — the source iterator reuses its buffer
        private var candidate: InternalRow = _
        private var candidateKey: InternalRow = _
        private var candidateTime: InternalRow = _

        private def advanceRight(): Unit = {
          while (rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyProj(r)
            if (!k.anyNull) {
              val t = rTimeProj(r)
              if (!t.anyNull) {
                rRow = r; rKey = k; rTime = t
                return
              }
            }
          }
          rRow = null
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTime = lTimeProj(lRow)
          if (lKey.anyNull || lTime.anyNull) {
            joined(lRow, nullRight)
          } else {
            // drop right rows of strictly smaller keys — they can
            // never match this or any later left row
            while (rRow != null && keyOrd.compare(rKey, lKey) < 0)
              advanceRight()
            // absorb right rows with equal key and time ≤ left time;
            // the LAST one (sorted by time, then payload) wins
            while (rRow != null && keyOrd.compare(rKey, lKey) == 0 &&
                timeOrd.compare(rTime, lTime) <= 0) {
              candidate = rRow.copy()
              candidateKey = rKey.copy()
              candidateTime = rTime.copy()
              advanceRight()
            }
            val ok = candidate != null &&
              keyOrd.compare(candidateKey, lKey) == 0 &&
              timeOrd.compare(candidateTime, lTime) <= 0
            joined(lRow, if (ok) candidate else nullRight)
          }
          resultProj(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
