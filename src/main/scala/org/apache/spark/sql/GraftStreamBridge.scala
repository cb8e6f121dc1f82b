package org.apache.spark.sql

/** Bridge to the `private[sql]` streaming-DataFrame constructor. A V1
  * streaming [[org.apache.spark.sql.execution.streaming.Source]] must
  * return micro-batch DataFrames whose logical plan carries
  * `isStreaming = true` (MicroBatchExecution asserts exactly that), but
  * the only public constructors build batch plans. The established
  * lake-format pattern (Delta's DeltaSource does the same hop) is to
  * re-wrap the computed batch plan through
  * `SparkSession.internalCreateDataFrame(_, _, isStreaming = true)`,
  * which Spark keeps `private[sql]` — hence this one-method bridge in
  * the parent package, next to [[GraftSqlBridge]].
  *
  * The wrap costs nothing at runtime: `queryExecution.toRdd` is the
  * batch plan's own (lazy) physical RDD — vectorized parquet scans,
  * joins, and whole-stage codegen all intact — evaluated only when the
  * micro-batch runs. */
object GraftStreamBridge {
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }

  /** The reverse hop, for a V1 [[org.apache.spark.sql.execution
    * .streaming.Sink]]: `addBatch`'s DataFrame is wired to the
    * micro-batch's IncrementalExecution and still carries
    * `isStreaming = true`, so batch writers (our manifest commits)
    * refuse it. Re-wrap the physical RDD as a plain batch frame —
    * Spark's own ForeachBatchSink does exactly this hop before handing
    * the user function its DataFrame. */
  def asBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }
}
