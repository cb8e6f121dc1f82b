package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions

/** Physical data layout for scan efficiency at lake scale — the write-side
  * half of "push down and prune". The reference reprocesses its whole
  * prefix every trigger (`Task_1/task_1.py:88-104` re-lists and re-reads
  * every CSV); at 100 TB the only affordable reads are PRUNED reads, and
  * pruning is decided at WRITE time:
  *
  *  - [[writeZOrdered]] clusters files and row groups on a Morton
  *    interleave of two dimension keys, so parquet min/max stats prune
  *    scans filtered on EITHER column (a plain sort prunes only its
  *    leading column). Pure write-side change — readers just scan the
  *    directory and get the skipping for free from pushed filters.
  *  - [[writeBucketed]] hash-buckets a table on its join key, so every
  *    subsequent join or aggregation on that key is exchange-free: the
  *    scan itself reports `HashPartitioning(key, n)` and the planner
  *    drops the shuffle. For a fact table joined on the same key by
  *    every query (lineitem ⋈ orders on orderkey), this converts the
  *    biggest recurring shuffle in the workload into a co-located read.
  *
  * Both are deterministic full-pass writes: one range/hash exchange at
  * write time buys every later query its pruning/co-location, the
  * standard amortization for curated training-data tables that are
  * written once and scanned by every downstream experiment.
  */
object Layout {

  /** Morton key of two dimension columns (bit-interleave of the low 31
    * bits of each; see [[graft.functions.GraftExpressions.ZOrder2]]). */
  def zorderKey(x: Column, y: Column): Column = GraftExpressions.zorder2(x, y)

  /** Write `df` clustered on the z-order curve of (x, y): a range
    * exchange into `numFiles` curve segments, an intra-partition sort on
    * the curve position, then a plain parquet write (the curve key
    * itself is NOT persisted — it is a layout decision, not data).
    *
    * `blockSize` caps the parquet row-group size; row-group min/max
    * stats are the pruning granule, so at test scale a small cap makes
    * skipping observable (LayoutSpec) while at lake scale the default
    * 128 MB granule is what a 1000-executor scan prunes against.
    */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, path: String,
                    numFiles: Int, blockSize: Option[Long] = None): Unit = {
    val z = zorderKey(x, y)
    val w = df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite")
    blockSize.foreach(b => w.option("parquet.block.size", b.toString))
    w.parquet(path)
  }

  /** Write `df` as a bucketed managed table: hash-partitioned into
    * `numBuckets` on `key` with bucket files sorted on it. Joins and
    * aggregations on `key` between tables bucketed to the same count
    * plan with ZERO exchanges (asserted in LayoutSpec) — at 100 TB this
    * removes the fact-⋈-fact shuffle entirely, the single largest data
    * movement in the workload. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Idempotent bucketed-table accessor: create the bucketed copy of
    * `df` on first use, then serve it from the catalog. The table name
    * carries the caller's tag so different scale factors / suites never
    * collide. */
  def bucketedTable(spark: SparkSession, df: => DataFrame, table: String,
                    key: String, numBuckets: Int): DataFrame = {
    if (!spark.catalog.tableExists(table)) {
      // a previous JVM may have left files at the managed location while
      // this session's in-memory catalog is empty — clear them so the
      // CREATE below never trips over a non-empty path
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.conf.warehousePath, table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      writeBucketed(df, table, key, numBuckets)
    }
    spark.table(table)
  }
}
