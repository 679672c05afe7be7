package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native backward as-of join — the whole-operator custom-plan path
  * (SURVEY §4.2 preference (c): LogicalPlan + Strategy + SparkPlan,
  * registered through SparkSessionExtensions / experimental strategies).
  *
  * Semantics: for each left row, the single right row with the same key
  * and the greatest time ≤ the left row's time (inner: unmatched left rows
  * drop). Equivalent to the composed range-join + keep-latest-rank form
  * (asserted in AsOfJoinSpec), but executes as ONE streaming merge pass:
  *
  *   - both children hash-cluster on the key and sort by (key, time) —
  *     declared via requiredChildDistribution/Ordering, so Catalyst inserts
  *     exactly one shuffle + sort per side;
  *   - per partition, a two-pointer scan advances the right iterator
  *     monotonically, holding only the current best-match row — O(n+m)
  *     time, O(1) state, no candidate-pair blowup and no per-key buffering,
  *     which is what makes it safe at 100 TB against skewed keys (the
  *     composed form materializes every (left, earlier-right) pair before
  *     ranking).
  *
  * v1 scope: LongType key and time on both sides (cast at the API surface).
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, leftTime: Expression,
                    rightKey: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, leftTime: Expression,
                        rightKey: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val schema = output
    left.execute().zipPartitions(right.execute()) { (leftIt, rightIt) =>
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(schema.map(_.dataType).toArray)
      val rBuf = rightIt.buffered
      // best match so far for the key currently being scanned
      var bestKey = 0L
      var best: InternalRow = null
      leftIt.flatMap { lRow =>
        // inner-join null semantics: a null key or time never matches —
        // skip the row rather than unboxing null to 0L (which would
        // silently join null-keyed rows as key/time 0)
        val kAny = lKey.eval(lRow)
        val tAny = lTime.eval(lRow)
        if (kAny == null || tAny == null) Iterator.empty
        else {
          val k = kAny.asInstanceOf[Long]
          val t = tAny.asInstanceOf[Long]
          if (best != null && bestKey != k) best = null
          // advance the right side monotonically: skip keys < k, fold in
          // right rows with key == k and time <= t (last one wins — sorted)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val hkAny = rKey.eval(head)
            if (hkAny == null) { rBuf.next(); () } // nulls sort first: drop
            else {
              val hk = hkAny.asInstanceOf[Long]
              if (hk < k) { rBuf.next(); () }
              else if (hk == k) {
                val htAny = rTime.eval(head)
                if (htAny == null) { rBuf.next(); () }
                else if (htAny.asInstanceOf[Long] <= t) {
                  best = rBuf.next().copy(); bestKey = k
                } else advancing = false
              } else advancing = false
            }
          }
          if (best != null && bestKey == k) Iterator.single(proj(joined(lRow, best)))
          else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the physical operator. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

/** User-facing surface. */
object AsOf {
  /** Backward as-of join of two frames on a long key and long time column.
    * Installs the planner strategy on the session if absent. */
  def join(spark: SparkSession, left: DataFrame, right: DataFrame,
           leftKey: Column, leftTime: Column,
           rightKey: Column, rightTime: Column): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val node = AsOfJoin(
      GraftBridge.logicalPlan(left), GraftBridge.logicalPlan(right),
      GraftBridge.expression(leftKey), GraftBridge.expression(leftTime),
      GraftBridge.expression(rightKey), GraftBridge.expression(rightTime))
    GraftBridge.ofRows(spark, node)
  }
}
