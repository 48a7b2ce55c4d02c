package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Test-only bridge into the `private[sql]` Dataset constructor: the
  * window-bound audit needs to EXECUTE an arbitrary logical subtree
  * (the child of a global Window node) to count the rows actually
  * flowing into the single-partition window — plan statistics are
  * estimates, and the audit's whole point is a measured bound.
  * Lives in the Spark package solely to satisfy the access qualifier;
  * nothing here touches Spark internals beyond the public-shape
  * `ofRows` factory.
  */
object GraftPlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
