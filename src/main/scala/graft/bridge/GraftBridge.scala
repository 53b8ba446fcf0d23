package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` plan→DataFrame constructor — the
  * standard pattern for extension libraries introducing custom
  * logical operators (the public Dataset API deliberately exposes no
  * entry point for foreign plans; a file in this package is how
  * third-party Spark libraries reach it). Used by
  * [[graft.plans.TopKPerGroup]]. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
