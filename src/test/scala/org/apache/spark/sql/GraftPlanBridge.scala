package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only bridge into the `private[sql]` `classic.Dataset.ofRows`:
  * the plan-audit gate executes self-join CHILD plans standalone to
  * measure their row counts and join-key cardinality across fixtures.
  * Lives in the Spark package purely for access; never shipped in the
  * library jar (test scope). */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
