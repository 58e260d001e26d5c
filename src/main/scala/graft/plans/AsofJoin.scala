package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/**
 * Native as-of join: whole-operator Catalyst extension — logical node,
 * planner strategy, and a physical merge operator — the tier of the
 * custom-operator ladder below composed DataFrame ops and scalar
 * expressions (SparkSessionExtensions / extraStrategies).
 *
 * Semantics: inner backward as-of — every left row joins the right row
 * of the same key group with the greatest right time <= left time
 * (`strict`: <). Among equal-(key, time) right rows the winner is the
 * last under the right child's full column ordering, which the
 * operator REQUIRES (deterministic output; matches
 * [[graft.operators.Joins.asof]]'s largest-payload-tuple tie-break
 * when the right side is projected (keys, time, payload...)).
 *
 * Scale shape vs the union+window formulation (`Joins.asof`):
 * - each side shuffles ITS OWN rows clustered by its keys (the window
 *   trick shuffles a UNION widened to the sum of both schemas with
 *   null padding — roughly double the bytes through the exchange);
 * - the per-partition pass is a streaming two-iterator merge with
 *   O(1) state (current best match per key) — no window buffer, no
 *   `last(ignoreNulls)` scan over every filled column;
 * - Catalyst still owns distribution + ordering: EnsureRequirements
 *   inserts the exchanges/sorts (or elides them when a child is
 *   already bucketed/sorted — a bucketed history table joins with NO
 *   shuffle at all, which the union formulation can never do).
 */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    strict: Boolean) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "asof join needs matching non-empty key lists")
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] onto [[AsofJoinExec]]; inject via
  * `spark.experimental.extraStrategies` or GraftExtensions. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, strict) =>
      AsofJoinExec(lk, rk, lt, rt, strict, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, strict: Boolean,
    left: SparkPlan, right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"))

  // co-clustered children: EnsureRequirements makes both hash
  // partitionings compatible (same partition count, aligned keys) —
  // exactly the SortMergeJoin contract
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // left: (keys, time); right: (keys, time, every remaining orderable
  // column) — the trailing columns pin WHICH equal-instant right row
  // wins (the last one), making the operator's output deterministic
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val l = leftKeys.map(SortOrder(_, Ascending)) :+
      SortOrder(leftTime, Ascending)
    val keyAndTime = rightKeys :+ rightTime
    val tieBreak = right.output.filterNot(a =>
      keyAndTime.exists(_.semanticEquals(a)))
      .filter(a => RowOrdering.isOrderable(a.dataType))
    val r = (keyAndTime ++ tieBreak).map(SortOrder(_, Ascending))
    Seq(l, r)
  }

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    // capture SERIALIZABLE ingredients only; projections/orderings are
    // codegen'd objects and must be created per partition
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val lOut = left.output; val rOut = right.output
    val outAttrs = output
    val strictLocal = strict
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = TypeUtils.getInterpretedOrdering(lTime.dataType)
        .asInstanceOf[Ordering[Any]]
      val lTimeEval = BindReferences.bindReference(lTime, lOut)
      val rTimeEval = BindReferences.bindReference(rTime, rOut)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        // one-row lookahead on the right; rows from the sort iterator
        // are REUSED buffers, so anything retained across next() is
        // copied
        private var rHead: InternalRow = _
        private var rHeadValid = false
        private def advanceRight(): Unit =
          if (rIter.hasNext) { rHead = rIter.next(); rHeadValid = true }
          else { rHead = null; rHeadValid = false }
        advanceRight()
        // best match so far: the latest right row (and its key) whose
        // time passed the bound for the current left cursor — O(1)
        // state per partition, the whole point of the merge form
        private var curMatch: InternalRow = _
        private var curMatchKey: InternalRow = _
        private var pending: InternalRow = _

        private def computeNext(): Unit = {
          pending = null
          while (pending == null && lIter.hasNext) {
            val l = lIter.next()
            val lt = lTimeEval.eval(l)
            if (lt != null) {
              val lk = lKeyProj(l)
              var advancing = rHeadValid
              while (advancing) {
                val rk = rKeyProj(rHead)
                val c = keyOrd.compare(rk, lk)
                if (c < 0) advanceRight() // keys are exhausted for
                // every current and future left row (both sorted asc)
                else if (c > 0) advancing = false
                else {
                  val rt = rTimeEval.eval(rHead)
                  if (rt == null) advanceRight() // never matchable
                  else {
                    val tc = timeOrd.compare(rt, lt)
                    if (tc < 0 || (tc == 0 && !strictLocal)) {
                      curMatch = rHead.copy()
                      curMatchKey = rk.copy()
                      advanceRight()
                    } else advancing = false
                  }
                }
                if (!rHeadValid) advancing = false
              }
              if (curMatchKey != null && keyOrd.compare(curMatchKey, lk) == 0) {
                numOut += 1
                pending = resultProj(joined(l, curMatch))
              }
            }
          }
        }
        // LAZY advance: resultProj reuses one output buffer, so the
        // next row must only be computed after the consumer is done
        // with the previous one (the standard SparkPlan row-reuse
        // contract) — computing eagerly inside next() would overwrite
        // the buffer just handed out
        private var computed = false
        override def hasNext: Boolean = {
          if (!computed) { computeNext(); computed = true }
          pending != null
        }
        override def next(): InternalRow = {
          if (!computed) computeNext()
          computed = false
          pending
        }
      }
    }
  }
}
