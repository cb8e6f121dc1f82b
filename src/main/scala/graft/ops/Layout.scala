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
  def zorderKey3(x: Column, y: Column, z: Column): Column =
    GraftExpressions.zorder3(x, y, z)

  /** Hilbert key of two dimension columns — the locality-superior
    * curve ([[graft.functions.GraftExpressions.Hilbert2]]): consecutive
    * key values are always grid neighbors, so range-partitioned files
    * carry tighter per-dimension bounding boxes than Morton's. */
  def hilbertKey(x: Column, y: Column): Column =
    GraftExpressions.hilbert2(x, y)

  /** The integral Morton-curve input for a clustering column of type
    * `dt` — the mapping that makes DATE/TIMESTAMP/STRING first-class
    * z-order keys (date is THE production clustering axis; the
    * integral-only refusal this replaces made users derive it by hand):
    *
    *  - integral types pass through (widened to long by the interleave);
    *  - DATE → epoch-day (`unix_date`): ~2.9M days fit the 21-bit 3-D
    *    budget with 3000 years to spare;
    *  - TIMESTAMP (tz or ntz) → epoch-HOURS, not micros/seconds: the
    *    interleave reads only the low `bitsPerDim` bits, so a granule
    *    whose representable span overflows them WRAPS and destroys
    *    locality (low 31 bits of epoch-micros wrap every ~35 minutes).
    *    Epoch-hours span 239 years even at 21 bits, and an hour is far
    *    below file granularity at lake scale, so nothing is lost;
    *  - STRING → big-endian window of the UTF-8 bytes, one byte per
    *    full 8 bits of the budget (3 bytes at 31, 2 at 21), zero-padded
    *    on the right so shorter strings sort first — lexicographic
    *    order on the window maps to numeric order, which is exactly
    *    what range-partitioning the curve needs. `skipBytes` skips a
    *    KNOWN-COMMON prefix first (URL schemes, id prefixes — the
    *    common prefix of a column's global min and max is shared by
    *    every value between them, so skipping it is order-preserving
    *    and moves the window onto bytes that actually discriminate;
    *    [[Manifest.clusterZ]] derives it from the manifest's own
    *    stats, zero data read).
    *
    * Unsupported types (fractional, binary, nested) refuse loudly: a
    * blind cast would null the curve key and silently collapse the
    * table into one un-clustered range. NULL values map to NULL and
    * range-partition into one end of the curve, like any sort. */
  def mortonInput(dt: org.apache.spark.sql.types.DataType, c: Column,
                  bitsPerDim: Int, skipBytes: Int = 0): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => c.cast("long")
      case DateType => unix_date(c).cast("long")
      case TimestampType => floor(unix_micros(c) / lit(3600L * 1000000L))
        .cast("long")
      case TimestampNTZType =>
        floor(unix_micros(c.cast(TimestampType)) / lit(3600L * 1000000L))
          .cast("long")
      case StringType =>
        val nBytes = math.max(1, bitsPerDim / 8)
        conv(rpad(hex(substring(c.cast("binary"), skipBytes + 1, nBytes)),
          nBytes * 2, "0"), 16, 10).cast("long")
      case other => throw new IllegalArgumentException(
        s"z-order column of type ${other.catalogString} is not " +
          "curve-orderable — supported: integral, date, timestamp, " +
          "string (derive an integral column for anything else)")
    }
  }

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

  /** Result of a [[compact]] pass: how many partitions were rewritten and
    * the data-file counts over the WHOLE table before and after. */
  final case class CompactStats(partitionsCompacted: Int,
                                filesBefore: Int, filesAfter: Int)

  /** OPTIMIZE-style small-file compaction of a `partitionCol`-partitioned
    * parquet table — the maintenance pass every streaming/incremental
    * writer needs: micro-batch and per-executor writes leave hundreds of
    * KB-sized files per partition, and at lake scale scan cost is
    * dominated by file-open overhead once files are far below the 128 MB
    * granule (each file is a task + a footer read + a seek).
    * ([[graft.io.Sinks.compactParquet]] is the flat-directory sibling —
    * one whole-table coalesce; this pass is for PARTITIONED tables,
    * where rewriting the whole lake to fix a few fragmented partitions
    * is not an option.)
    *
    * Bin-packing: a partition holding B bytes in F files is rewritten to
    * `ceil(B / targetBytes)` files iff F exceeds that (and `minFiles`).
    * The pass is:
    *  - planned from the FILE LISTING only (driver state = one row per
    *    partition, like [[Merge.mergeInto]]'s affected list — never row
    *    data);
    *  - executed as ONE job over the affected partitions: a
    *    partition-pruned scan, a repartition on (partition, salt) where
    *    salt < the partition's planned file count, and a dynamic-
    *    partition overwrite staged exactly like MERGE (underscore dir).
    *    A failure while WRITING staging leaves the table untouched; the
    *    dynamic-overwrite COMMIT itself has a narrow window (it deletes
    *    each target partition directory before renaming the staged
    *    replacement in, same exposure as [[Merge.mergeInto]]) — recovery
    *    from a crash inside that commit is re-running compact, which
    *    replays from the surviving source of truth (the commit only
    *    runs after staging is fully materialized);
    *  - answer-invariant (content identical before/after — `lay_compact`
    *    hash-matches the uncompacted oracle) and IDEMPOTENT: a second
    *    pass finds every partition already at its packed file count and
    *    rewrites nothing (untouched partitions keep their exact files —
    *    byte-identity asserted in LayoutSpec).
    */
  def compact(spark: SparkSession, tableDir: String, partitionCol: String,
              targetBytes: Long = 128L << 20, minFiles: Int = 2): CompactStats = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def dataFiles(dir: Path): Array[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).filter(st => st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
    def partitionDirs: Array[Path] = fs.listStatus(root)
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$partitionCol="))
      .map(_.getPath)

    val before = partitionDirs.map(p => p -> dataFiles(p))
    val filesBefore = before.map(_._2.length).sum
    // plan: (dir name, UNESCAPED partition value, packed file count) for
    // every partition whose file count exceeds its bin-packed target.
    // Directory names are Hive-escaped (a value `a:b` is stored as
    // `a%3Ab`), so they must be unescaped before they can match the
    // cast-to-string column values below; the null-partition sentinel
    // (__HIVE_DEFAULT_PARTITION__) has no string value to match and is
    // skipped — a null-partitioned table compacts its non-null
    // partitions only.
    val plan = before.flatMap { case (dir, files) =>
      val bytes = files.map(_.getLen).sum
      val packed = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      val raw = dir.getName.stripPrefix(s"$partitionCol=")
      if (files.length > packed && files.length >= minFiles &&
          raw != org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .DEFAULT_PARTITION_NAME)
        Some((dir.getName,
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(raw),
          packed))
      else None
    }
    if (plan.isEmpty)
      return CompactStats(0, filesBefore, filesBefore)

    val planDf = broadcast(spark.createDataFrame(plan.toSeq.map(p => (p._2, p._3)))
      .toDF("_pval", "_out_files"))
    val affected = spark.read.parquet(tableDir)
      .filter(col(partitionCol).cast("string").isin(plan.map(_._2).toIndexedSeq: _*))
    val dataCols = affected.columns.filterNot(_ == partitionCol)
    // deterministic row salt bounded by the partition's packed count: a
    // (partition, salt) group always lands whole in one write task, so a
    // partition emits at most _out_files files. The salt RIDES THROUGH
    // staging and the read-back re-groups on it — re-splitting staging
    // files by size alone (the previous shape) could split a group whose
    // staging file exceeds maxPartitionBytes across tasks, emitting more
    // files than planned and re-triggering a rewrite on the next pass.
    val salted = affected
      .join(planDf, col(partitionCol).cast("string") === col("_pval"))
      .withColumn("_salt",
        pmod(xxhash64(dataCols.map(col).toIndexedSeq: _*), col("_out_files")))
      .drop("_pval", "_out_files")

    val staging = new Path(root, "_compact_staging").toString
    salted.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging)
      .repartition(col(partitionCol), col("_salt"))
      .drop("_salt")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(tableDir)
    fs.delete(new Path(staging), true)

    // report what actually happened: a planned partition counts as
    // compacted only if its file count really dropped (the earlier
    // count of PLANNED partitions silently overstated when an escaped
    // name failed to match and the partition was left fragmented)
    val afterCounts = partitionDirs.map(p => p.getName -> dataFiles(p).length).toMap
    val beforeCounts = before.map { case (d, fl) => d.getName -> fl.length }.toMap
    val compacted = plan.count { case (dirName, _, _) =>
      afterCounts.getOrElse(dirName, 0) < beforeCounts(dirName)
    }
    CompactStats(compacted, filesBefore, afterCounts.values.sum)
  }

  final case class VacuumStats(partitionsDropped: Int, partitionsKept: Int,
                               filesDropped: Int)

  /** Retention vacuum: drop every partition of a `partitionCol`-
    * partitioned parquet table whose value fails `keep` — the
    * time-to-live maintenance pass that pairs with [[compact]] (a lake
    * ingesting daily partitions forever either expires them or pays for
    * them forever). Deletion is whole-directory: no rewrite, no read of
    * surviving data, driver state = one entry per partition.
    *
    * `keep` sees the UNESCAPED partition value (directory names are
    * Hive-escaped — `a:b` is stored as `a%3Ab`), and the null partition
    * (`__HIVE_DEFAULT_PARTITION__`) arrives as `None` — retention on a
    * column that can be null must decide for those rows explicitly.
    *
    * Crash safety: each drop is an independent directory delete;
    * nothing touches surviving partitions, and a rerun after a crash
    * simply finishes the remainder (idempotent — spec'd). The predicate
    * runs on the DRIVER against partition values only (bounded by the
    * partition count), never against data. */
  def vacuum(spark: SparkSession, tableDir: String, partitionCol: String,
             keep: Option[String] => Boolean): VacuumStats = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(root).filter(st => st.isDirectory &&
      st.getPath.getName.startsWith(s"$partitionCol="))
    var dropped = 0
    var filesDropped = 0
    dirs.foreach { st =>
      val raw = st.getPath.getName.stripPrefix(s"$partitionCol=")
      val value =
        if (raw == org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .DEFAULT_PARTITION_NAME) None
        else Some(org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(raw))
      if (!keep(value)) {
        filesDropped += fs.listStatus(st.getPath).count(f => f.isFile && {
          val n = f.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        })
        fs.delete(st.getPath, true)
        dropped += 1
      }
    }
    VacuumStats(dropped, dirs.length - dropped, filesDropped)
  }

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
