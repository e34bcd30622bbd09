package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `Dataset.ofRows` (private[sql]) so graft can materialize a
  * DataFrame over a hand-built logical node (the native as-of join plan,
  * `graft.plans.AsOfJoinPlan`). Living in the `org.apache.spark.sql`
  * package is the standard mechanism third-party Spark libraries use to
  * construct Datasets from custom LogicalPlans. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
