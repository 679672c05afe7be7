package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface: the supported way for an extension
  * library to wrap a custom Catalyst [[Expression]] as a user-facing
  * [[Column]] on Spark 4 (Column is ColumnNode-backed there; the classic
  * converter lives behind package-private access). Nothing else from the
  * private surface is touched. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (Dataset.ofRows is private[sql]). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Re-declare the physical layout of a pinned (checkpointed) frame (r15).
    *
    * `Dataset.localCheckpoint` copies the physical plan's
    * `outputPartitioning` into the resulting `LogicalRDD` — but under AQE
    * the executed plan is an `AdaptiveSparkPlanExec`, which reports
    * `UnknownPartitioning`, so a pin built from `repartition(n, cols)`
    * LOSES its layout and every downstream join re-exchanges the pinned
    * relation (measured: 5 re-exchanges of the 352M-edge table per
    * pagerank run at the 300× ScaleGen corpus). This rewraps the pinned
    * RDD with the `HashPartitioning(cols, n)` the repartition actually
    * produced. CORRECTNESS PRECONDITION (caller-owned): the frame must be
    * the direct pin of a `repartition(n, cols)` — a user-specified
    * partition count, which AQE never coalesces (REPARTITION_BY_NUM), so
    * the declared layout is the physical truth; the partition-count
    * equality is asserted here as a cheap guard. */
  def withHashPartitioning(df: DataFrame, cols: Seq[String], numParts: Int): DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val lr = df.queryExecution.analyzed match {
      case l: LogicalRDD => l
      case other => throw new IllegalArgumentException(
        s"withHashPartitioning needs a pinned LogicalRDD frame, got ${other.nodeName}")
    }
    require(lr.rdd.getNumPartitions == numParts,
      s"pinned RDD has ${lr.rdd.getNumPartitions} partitions, caller declared $numParts")
    val attrs = cols.map(c => lr.output.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(
        s"column $c not among pinned output ${lr.output.map(_.name).mkString(",")}")))
    val rewrapped = new LogicalRDD(lr.output, lr.rdd,
      HashPartitioning(attrs, numParts), lr.outputOrdering, lr.isStreaming, lr.stream)(
      df.sparkSession.asInstanceOf[classic.SparkSession], None, None)
    classic.Dataset.ofRows(df.sparkSession.asInstanceOf[classic.SparkSession], rewrapped)
  }
}
