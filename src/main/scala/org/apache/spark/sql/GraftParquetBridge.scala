package org.apache.spark.sql

import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Bridge to Spark's internal parquet [[org.apache.spark.sql.execution
  * .datasources.OutputWriter]] so a SMALL, driver-resident row set (a
  * manifest commit's entry list — a few KB) can be written as ONE
  * parquet file without scheduling a Spark job: `df.coalesce(1)
  * .write.parquet` costs a full job submit + task launch (~100 ms of
  * pure overhead at any data size) per manifest commit, which at a
  * multi-commit lifecycle is most of the commit's wall time.
  *
  * Fidelity: this goes through the SAME `ParquetFileFormat
  * .prepareWrite` + `ParquetWriteSupport` pipeline an executor write
  * task uses — same SQLConf-derived codec, timestamp encoding, and
  * physical list/group structure — so the written footer schema is
  * byte-compatible with executor-written manifest parts (the linked-
  * chain eligibility check compares exactly that). */
object GraftParquetBridge {
  /** Schema of the FIRST data file under `path` (a file or a directory),
    * read from its footer ON THE DRIVER and converted with the same
    * `ParquetToSparkSchemaConverter` (same SQLConf flags — binary-as-
    * string, INT96, nanos-as-long) that `spark.read.parquet` inference
    * uses per footer. Rationale: with `mergeSchema=false` (default),
    * `DataSource.resolveRelation` still funnels one representative
    * footer through `mergeSchemasInParallel`, i.e. a whole SPARK JOB
    * per schema inference — ~30-80 ms of pure scheduling for a 2 ms
    * footer read. Every internal read whose schema is uniform by
    * construction (manifest parts, checkpoints, testdata tables) can
    * take this instead and pass the result to `spark.read.schema(...)`.
    * None when no data file exists — caller falls back to inference. */
  def localInferSchema(spark: SparkSession, path: String): Option[StructType] =
    try {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val st0 = fs.getFileStatus(p)
      val dataFile =
        if (st0.isFile) Some(st0)
        else fs.listStatus(p).find(st => st.isFile && st.getLen > 0 &&
          !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
      dataFile.map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, conf)
        val opts = org.apache.parquet.format.converter
          .ParquetMetadataConverter.SKIP_ROW_GROUPS
        val r = org.apache.parquet.hadoop.ParquetFileReader
          .open(in, org.apache.parquet.HadoopReadOptions.builder(conf)
            .withMetadataFilter(opts).build())
        val msg = try r.getFooter.getFileMetaData.getSchema finally r.close()
        new execution.datasources.parquet.ParquetToSparkSchemaConverter(
          spark.sessionState.conf).convert(msg)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  def writeLocalParquet(spark: SparkSession, schema: StructType,
                        rows: Iterator[InternalRow], file: String): Unit = {
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    val factory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, schema)
    val tac = new TaskAttemptContextImpl(job.getConfiguration,
      new TaskAttemptID(new TaskID(new JobID("graft-local", 0),
        TaskType.MAP, 0), 0))
    val writer = factory.newInstance(file, schema, tac)
    try rows.foreach(writer.write) finally writer.close()
  }
}
