package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the package-private `Dataset.ofRows` — the standard pattern
  * for extension libraries that construct DataFrames from custom
  * LogicalPlan nodes (graft.plans.GroupTopKPlan). Lives in
  * org.apache.spark.sql solely for access; no Spark internals are
  * modified. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
