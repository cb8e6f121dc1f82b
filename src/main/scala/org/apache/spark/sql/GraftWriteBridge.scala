package org.apache.spark.sql

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.internal.io.FileCommitProtocol
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{FileFormatWriter, WriteJobStatsTracker, WriteTaskStats, WriteTaskStatsTracker}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass batch write: parquet files AND the per-file manifest stats
  * (partition-value sets, null flag, row counts, min/max per stat
  * column, bloom bit positions, CHECK-constraint violations) collected
  * DURING the write through Spark's [[WriteJobStatsTracker]] hook — the
  * same mechanism Delta's transaction log uses. Replaces the former
  * write-then-re-read-the-batch shape: the read-back was a second full
  * scan of every byte just written (real I/O at lake scale, a whole
  * extra Spark execution at any scale).
  *
  * Fidelity contract: the stats expressions are NOT re-implemented
  * here — the caller builds them through the ordinary Column API
  * against a dummy frame (so the analyzer resolves casts, session
  * timezone, and eval mode exactly as the old aggregation pass did)
  * and hands them over bound to row ordinals. Min/max accumulate on
  * raw Catalyst values under the type's interpreted ordering (the same
  * ordering the Min/Max aggregates use) and render to strings at the
  * caller, via the same `Cast` the old pass used.
  */
object GraftWriteBridge {

  /** Raw per-file accumulation result. `statMins`/`statMaxs` carry raw
    * Catalyst values (UTF8String/Decimal/primitives — all
    * serializable); rendering happens caller-side. `bloomWords` is one
    * packed-long bitset per bloom column. */
  case class FileStat(name: String, values: Seq[UTF8String],
                      valuesOverflow: Boolean, hasNull: Boolean,
                      rows: Long, statMins: Seq[Any], statMaxs: Seq[Any],
                      bloomWords: Seq[Array[Long]], violations: Seq[Long])

  case class GraftTaskStats(files: Seq[FileStat]) extends WriteTaskStats

  /** Layout of the bound expression vector (all evaluated by ONE
    * projection per row):
    * [0]                      partition col cast to string
    * [1 .. nStats]            raw stat column values
    * [.. + nBloom*hashes]     nullable bloom bit positions (long)
    * [.. + nViol]             constraint-violation indicator (long 0/1)
    */
  class GraftBatchStatsTracker(bound: Seq[Expression],
                               statTypes: Seq[DataType],
                               nBloom: Int, bloomHashes: Int, bloomBits: Int,
                               nViol: Int, valuesCap: Int)
      extends WriteJobStatsTracker {
    @transient @volatile var results: Seq[FileStat] = Nil
    override def newTaskInstance(): WriteTaskStatsTracker =
      new GraftBatchTaskTracker(bound, statTypes, nBloom, bloomHashes,
        bloomBits, nViol, valuesCap)
    override def processStats(stats: Seq[WriteTaskStats],
                              jobCommitTime: Long): Unit =
      results = stats.flatMap(_.asInstanceOf[GraftTaskStats].files)
  }

  private class GraftBatchTaskTracker(bound: Seq[Expression],
                                      statTypes: Seq[DataType],
                                      nBloom: Int, bloomHashes: Int,
                                      bloomBits: Int, nViol: Int,
                                      valuesCap: Int)
      extends WriteTaskStatsTracker {
    private val nStats = statTypes.size

    private class Acc(val name: String) {
      val values = new java.util.TreeSet[UTF8String]()
      var valuesOverflow = false
      var hasNull = false
      var rows = 0L
      val mins = new Array[Any](nStats)
      val maxs = new Array[Any](nStats)
      val bloom = Array.fill(nBloom)(new java.util.BitSet(bloomBits))
      val viols = new Array[Long](math.max(nViol, 1))
    }

    private val accs = mutable.LinkedHashMap[String, Acc]()
    private var cur: Acc = null
    @transient private lazy val proj = {
      val p = UnsafeProjection.create(bound)
      p.initialize(Option(TaskContext.get()).map(_.partitionId()).getOrElse(0))
      p
    }
    @transient private lazy val ords: Array[Ordering[Any]] =
      statTypes.map(dt => TypeUtils.getInterpretedOrdering(dt)
        .asInstanceOf[Ordering[Any]]).toArray

    override def newPartition(partitionValues: InternalRow): Unit = ()
    override def newFile(filePath: String): Unit = {
      cur = new Acc(new Path(filePath).getName)
      accs(cur.name) = cur
    }
    override def closeFile(filePath: String): Unit = ()

    /** Copy a possibly-buffer-backed Catalyst value out of the reused
      * projection row before storing it across rows. */
    private def owned(v: Any): Any = v match {
      case u: UTF8String => u.copy()
      case d: org.apache.spark.sql.types.Decimal => d // immutable copy from row
      case x => x
    }

    override def newRow(filePath: String, row: InternalRow): Unit = {
      val r = proj(row)
      val a = cur
      a.rows += 1
      // partition value (already cast to string by the expression)
      if (r.isNullAt(0)) a.hasNull = true
      else {
        val s = r.getUTF8String(0)
        if (!a.values.contains(s)) {
          a.values.add(s.copy())
          if (a.values.size > valuesCap + 1) {
            // keep the SMALLEST cap+1 — identical to the old
            // slice(sort_array(collect_set(...)), 1, cap+1)
            a.values.pollLast()
            a.valuesOverflow = true
          }
        }
      }
      var i = 0
      while (i < nStats) {
        if (!r.isNullAt(1 + i)) {
          val v = r.get(1 + i, statTypes(i))
          val o = ords(i)
          if (a.mins(i) == null || o.lt(v, a.mins(i))) a.mins(i) = owned(v)
          if (a.maxs(i) == null || o.gt(v, a.maxs(i))) a.maxs(i) = owned(v)
        }
        i += 1
      }
      val bloomBase = 1 + nStats
      var b = 0
      while (b < nBloom * bloomHashes) {
        if (!r.isNullAt(bloomBase + b))
          a.bloom(b / bloomHashes).set(r.getLong(bloomBase + b).toInt)
        b += 1
      }
      val violBase = bloomBase + nBloom * bloomHashes
      var vI = 0
      while (vI < nViol) {
        a.viols(vI) += r.getLong(violBase + vI)
        vI += 1
      }
    }

    override def getFinalStats(taskCommitTimeMs: Long): WriteTaskStats = {
      import scala.jdk.CollectionConverters._
      GraftTaskStats(accs.values.filter(_.rows > 0).map { a =>
        // values: smallest cap+1 distinct, sorted (binary UTF8 order —
        // the order sort_array used); overflow when a cap+1-th exists
        val vals = a.values.iterator().asScala.toSeq
        FileStat(a.name, vals,
          valuesOverflow = a.valuesOverflow || vals.size > valuesCap,
          hasNull = a.hasNull, rows = a.rows,
          statMins = a.mins.toSeq, statMaxs = a.maxs.toSeq,
          bloomWords = a.bloom.toSeq.map(_.toLongArray),
          violations = a.viols.take(nViol).toSeq)
      }.toSeq)
    }
  }

  /** Execute `df`'s plan and write it as parquet under `outPath`
    * (flat, no partition dirs — the manifest batch layout), collecting
    * `trackers`' stats in the same pass. */
  def writeParquet(spark: SparkSession, df: DataFrame, outPath: String,
                   trackers: Seq[WriteJobStatsTracker]): Unit = {
    val sparkC = spark.asInstanceOf[classic.SparkSession]
    val dfC = df.asInstanceOf[classic.Dataset[Row]]
    val plan = dfC.queryExecution.executedPlan
    val hadoopConf = sparkC.sessionState
      .newHadoopConfWithOptions(Map.empty)
    val jobId = java.util.UUID.randomUUID().toString
    val committer = FileCommitProtocol.instantiate(
      sparkC.sessionState.conf.fileCommitProtocolClass,
      jobId = jobId, outputPath = outPath,
      dynamicPartitionOverwrite = false)
    FileFormatWriter.write(
      sparkSession = sparkC,
      plan = plan,
      fileFormat = new ParquetFileFormat(),
      committer = committer,
      outputSpec = FileFormatWriter.OutputSpec(outPath, Map.empty,
        plan.output),
      hadoopConf = hadoopConf,
      partitionColumns = Nil,
      bucketSpec = None,
      statsTrackers = trackers,
      options = Map.empty)
  }
}
