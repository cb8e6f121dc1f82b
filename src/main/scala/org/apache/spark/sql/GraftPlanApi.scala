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

  /** Re-root a fully-built BATCH DataFrame as a streaming-marked leaf —
    * what a v1 streaming `Source.getBatch` must return
    * (`MicroBatchExecution` asserts `isStreaming` on it). The Kafka
    * source's exact recipe (`internalCreateDataFrame(rdd, schema,
    * isStreaming = true)`): the batch plan is physically planned here
    * and enters the micro-batch as an opaque `LogicalRDD` LEAF, which
    * is load-bearing twice over — the assert is satisfied without
    * marking the plan's real leaves, and none of the batch plan's
    * internal operators (the change-diff's aggregates and joins) are
    * visible to `IncrementalExecution`, which would otherwise plan any
    * streaming-marked aggregate as a STATEFUL one inside the source's
    * own subplan. */
  def asStreamingBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val qe = df.asInstanceOf[classic.Dataset[Row]].queryExecution
    cs.internalCreateDataFrame(qe.toRdd, df.schema, isStreaming = true)
  }
}
