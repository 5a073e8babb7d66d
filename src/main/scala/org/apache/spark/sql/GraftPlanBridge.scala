package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal package-placed bridge to the `private[sql]` plan-to-Dataset
  * constructor — the standard pattern for libraries that contribute
  * custom logical operators (a `Dataset` can only be built from a
  * `LogicalPlan` via `Dataset.ofRows`, which Spark scopes to its own
  * package). Nothing else from the internal surface is exposed. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
