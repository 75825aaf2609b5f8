package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only bridge into the `sql`-private Dataset.ofRows: PlanSpec's
  * global-window audit needs to EXECUTE the input subtree of each
  * Window node it finds (to measure its row count across scale
  * factors), and building a Dataset from an arbitrary LogicalPlan is
  * package-private API.
  */
object GraftPlanBridge {
  def dfOf(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
