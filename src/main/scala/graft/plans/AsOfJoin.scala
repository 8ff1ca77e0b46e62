package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native as-of join — the whole-operator Catalyst extension path
  * (logical plan + planner strategy + physical exec) for a primitive
  * Spark lacks: for every left row, attach the single latest right row
  * of the same key whose time is <= the left row's time (left-outer
  * point-in-time semantics, ties count as prior).
  *
  * The reference's downstream engines expose this as MERGE ASOF /
  * temporal join; composing it from window functions forces the right
  * side's columns through a union + running-`max` per column, which
  * stops working the moment more than one right column must survive
  * (running-max of unrelated columns is not "the matching row").
  * The physical operator is a sort-merge scan: both children are
  * hash-clustered on the key and sorted by (key, time), then a single
  * forward pass per partition pairs each left row with the buffered
  * best-so-far right row — no window state, no per-column trickery,
  * O(|left| + |right|) per partition, and the children's shuffles are
  * exactly a sort-merge join's (AQE-planned, skew-splittable).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical sort-merge as-of join. Requires both children clustered on
  * the join key and sorted by (key, time) — EnsureRequirements inserts
  * the exchanges/sorts, so AQE sees ordinary shuffle stages. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // the merge emits left rows in their incoming order
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val rWidth = rOut.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // orderings/projections are codegen'd objects — built per
      // partition on the executor, never serialized from the driver
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow

      var rHead: InternalRow = null
      var best: InternalRow = null          // latest right row for bestKey
      var bestKey: UnsafeRow = null
      var bestTimeRow: UnsafeRow = null

      def advanceRight(): Unit = rHead = if (rIter.hasNext) rIter.next() else null
      advanceRight()

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        val lTimeNull = lTimeRow.isNullAt(0)
        // consume right rows that are usable now or can never be used
        // again (right is sorted by (key, time), left keys ascend)
        var done = rHead == null
        while (!done) {
          val rKey = rKeyProj(rHead)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0) advanceRight()
          else if (c == 0) {
            val rTimeRow = rTimeProj(rHead)
            if (!rTimeRow.isNullAt(0) && !lTimeNull &&
                timeOrd.compare(rTimeRow, lTimeRow) <= 0) {
              best = rHead.copy()
              bestKey = rKey.copy()
              bestTimeRow = rTimeRow.copy()
              advanceRight()
            } else if (rTimeRow.isNullAt(0)) advanceRight()
            else done = true
          } else done = true
          if (rHead == null) done = true
        }
        // SQL semantics: null keys never match; stale best from an
        // earlier key never matches the current one
        val matched =
          best != null && !lKey.anyNull && keyOrd.compare(bestKey, lKey) == 0 &&
            !lTimeNull && timeOrd.compare(bestTimeRow, lTimeRow) <= 0
        joined(lRow, if (matched) best else nullRight)
      }
    }
  }
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; injected through
  * `SparkSessionExtensions.injectPlannerStrategy` (sessions the library
  * constructs) or `spark.experimental.extraStrategies` (live harness
  * sessions). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTime, p.rightTime,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {

  /** Register the planner strategy on a live session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** `left` as-of-joined with `right` on `keys`, matching the latest
    * `right.rightTimeCol` <= `left.leftTimeCol` per key (ties match).
    * Right columns keep their names and become nullable. The right side
    * is re-aliased column-by-column so a self-join (both sides derived
    * from one scan) gets fresh attribute ids. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val rAliased = right.select(right.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rAliased.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${p.output.map(_.name).mkString(", ")}]"))
    val plan = AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol))
    org.apache.spark.sql.GraftShims.ofRows(spark, plan)
  }
}
