package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway an external plan library needs:
  * wrap a custom [[LogicalPlan]] as a DataFrame. Standard practice for
  * Spark extension libraries (the DataFrame constructor is sealed
  * inside the sql package); everything else in graft.plans uses public
  * extension points (`SparkSessionExtensions`). */
object GraftPlanApi {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
