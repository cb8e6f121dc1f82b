package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE (upsert) into a partitioned parquet table — the
  * lake-native analog of the reference's keyed upserts into its KV store
  * (`/root/reference/Task_2/task_2.py:144-197` put_items the same key
  * again on every rerun): new keys insert, existing keys take the
  * update's values, reruns are idempotent.
  *
  * Scale shape: the rewrite is PARTITION-PRUNED. Only partitions that
  * appear in the update batch are read, merged, and rewritten (dynamic
  * partition overwrite); a 100 TB table taking a daily 100 GB update
  * batch rewrites the touched dates, not the lake. The driver-side state
  * is one row per TOUCHED PARTITION (not per key) — bounded by the batch,
  * like the compaction planner. Assumes a key's partition value is stable
  * across updates (true of the reference: its partition attribute is part
  * of the key), so a key can never straddle an untouched partition.
  *
  * The merged partitions are staged under an underscore-prefixed subdir
  * (invisible to parquet directory scans) before the dynamic overwrite:
  * Spark refuses to overwrite a path it is simultaneously reading, and
  * the stage also means a mid-write failure leaves the target intact —
  * the rerun replays the same merge (idempotence spec'd in MergeSpec).
  */
object Merge {

  /** Above this many touched partitions the target read switches from an
    * In-literal filter (static pruning, fine for small batches) to
    * explicit partition-directory selection: a 10⁵-element In expression
    * is a driver planning blowup (every Catalyst transform walks and
    * copies the literal list), while handing the reader the affected
    * directories prunes BY CONSTRUCTION at any touched-partition count
    * with zero literals in the plan. */
  val InListThreshold: Int = 1000

  /** The partition-pruned read of the merge target: only partitions that
    * appear in `updates` are scanned. Exposed for MergeSpec's plan
    * assertions. Above `inListThreshold` the affected directories are
    * matched against the table's listing with Hive path-unescaping (a
    * value like `a:b` is stored as `a%3Ab`); matching is on the string
    * rendering of the partition value, which is how the dynamic writer
    * names directories for the string/date/integral partition columns
    * this engine partitions by. A null partition value in the updates
    * touches the `__HIVE_DEFAULT_PARTITION__` directory like any other
    * partition — its existing rows MUST join the merge (the dynamic
    * overwrite rewrites that directory, so leaving them out of the read
    * would delete them). */
  private[ops] def prunedTarget(spark: SparkSession, targetDir: String,
                                updates: DataFrame, partitionCol: String,
                                inListThreshold: Int): DataFrame = {
    // one row per touched partition — bounded by the update batch
    val affected = updates.select(col(partitionCol)).distinct()
      .collect().map(_.get(0))
    val hasNull = affected.contains(null)
    val nonNull = affected.filter(_ != null)
    if (affected.length <= inListThreshold) {
      val nonNullHit =
        if (nonNull.isEmpty) lit(false)
        else col(partitionCol).isin(nonNull.toIndexedSeq: _*)
      spark.read.parquet(targetDir)
        .filter(if (hasNull) nonNullHit || col(partitionCol).isNull
                else nonNullHit)
    } else {
      val root = new Path(targetDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val wanted = nonNull.map(_.toString).toSet
      val dirs = fs.listStatus(root)
        .filter { st =>
          st.isDirectory && st.getPath.getName.startsWith(s"$partitionCol=") && {
            val raw = st.getPath.getName.stripPrefix(s"$partitionCol=")
            if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) hasNull
            else wanted.contains(ExternalCatalogUtils.unescapePathName(raw))
          }
        }
        .map(_.getPath.toString)
      if (dirs.isEmpty) // every update partition is brand new
        spark.read.parquet(targetDir).filter(lit(false))
      else
        spark.read.option("basePath", targetDir).parquet(dirs.toIndexedSeq: _*)
    }
  }

  /** Upsert `updates` into the partitioned parquet table at `targetDir`.
    * `updates` must carry the full table schema including `partitionCol`.
    * Update rows win on key collision, column-wise (`coalesce(update,
    * target)` — a null in an update column keeps the target's value,
    * the reference's attribute-level put semantics). Bootstraps the
    * table on first call. */
  def mergeInto(spark: SparkSession, targetDir: String, updates: DataFrame,
                keys: Seq[String], partitionCol: String,
                inListThreshold: Int = InListThreshold): Unit = {
    val root = new Path(targetDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) {
      updates.write.partitionBy(partitionCol).parquet(targetDir)
      return
    }

    val target = prunedTarget(spark, targetDir, updates, partitionCol,
      inListThreshold)

    val dataCols = updates.columns
    val merged = target.alias("t")
      .join(updates.alias("u"),
        keys.map(k => col(s"u.$k") <=> col(s"t.$k")).reduce(_ && _),
        "full_outer")
      .select(dataCols.map(c =>
        coalesce(col(s"u.$c"), col(s"t.$c")).as(c)): _*)

    val staging = new Path(root, "_merge_staging").toString
    merged.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(targetDir)
    fs.delete(new Path(staging), true)
  }

  /** Copy-on-write keyed DELETE from a partitioned parquet table — the
    * GDPR/retention complement of [[mergeInto]] (the reference's
    * delete_item side of the KV contract). Same partition-pruned shape:
    * only partitions present in `deletes` are read, anti-joined against
    * the delete keys, staged, and dynamic-partition-overwritten;
    * untouched partitions keep their exact files.
    *
    * One case the overwrite machinery cannot express: a partition whose
    * rows are ALL deleted produces no staged rows, so the dynamic
    * overwrite never touches its directory and the rows would silently
    * survive. Those emptied partitions are removed explicitly after the
    * write (the delete-then-rerun crash window matches [[mergeInto]]'s
    * commit-phase exposure: rerunning the same delete batch finishes the
    * job). `deletes` must carry `keys ++ partitionCol`; as in
    * [[mergeInto]], a key's partition value is assumed stable. */
  def deleteWhere(spark: SparkSession, targetDir: String, deletes: DataFrame,
                  keys: Seq[String], partitionCol: String,
                  inListThreshold: Int = InListThreshold): Unit = {
    val root = new Path(targetDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return

    val target = prunedTarget(spark, targetDir, deletes, partitionCol,
      inListThreshold)
    val remaining = target.join(
      deletes.select(keys.map(col): _*).distinct(),
      keys.toSeq, "left_anti")

    // a batch can empty EVERY touched partition; an all-empty staging
    // dir has no parquet footers to read back, so branch before writing
    val hasSurvivors = !remaining.isEmpty
    val survived: Set[Option[String]] =
      if (hasSurvivors) {
        val staging = new Path(root, "_delete_staging").toString
        remaining.write.mode("overwrite").parquet(staging)
        val staged = spark.read.parquet(staging)
        staged.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partitionCol)
          .parquet(targetDir)
        val s = staged.select(col(partitionCol)).distinct()
          .collect().map(r => Option(r.get(0)).map(_.toString)).toSet
        fs.delete(new Path(staging), true)
        s
      } else Set.empty

    // partitions the batch touched but the staged write left empty:
    // their directories must go, or the "deleted" rows survive
    val touched = deletes.select(col(partitionCol)).distinct()
      .collect().map(r => Option(r.get(0)).map(_.toString)).toSet
    (touched -- survived).foreach { v =>
      val dirName = v match {
        case Some(s) =>
          s"$partitionCol=${ExternalCatalogUtils.escapePathName(s)}"
        case None =>
          s"$partitionCol=${ExternalCatalogUtils.DEFAULT_PARTITION_NAME}"
      }
      fs.delete(new Path(root, dirName), true)
    }
  }

  /** SCD Type-2 apply: fold one update batch into a history-preserving
    * dimension table (Kimball's slowly-changing-dimension type 2 — every
    * attribute change CLOSES the current row and INSERTS a new version,
    * so any past state remains queryable with `valid_from <= d <
    * coalesce(valid_to, 'inf')`). This is the history-keeping upgrade of
    * [[mergeInto]]'s last-write-wins puts (the reference overwrites each
    * key in place, `/root/reference/Task_2/task_2.py:144-197`, so history
    * is lost there by design).
    *
    * `history` rows: `keys ++ tracked ++ (validFromCol, validToCol)`;
    * a row is CURRENT iff `validToCol` is null, and a key has at most one
    * current row. `updates` rows: `keys ++ tracked ++ effectiveCol`, at
    * most one row per key per batch (fold multiple snapshots by calling
    * once per effective date, oldest first).
    *
    * Per matched key:
    *  - tracked values identical (null-safe) → no-op;
    *  - `effective <= valid_from` of the current row → STALE update,
    *    dropped (out-of-order replay must not fork history);
    *  - otherwise → current row closed at `effective`, new version
    *    opened at `effective`.
    * Unmatched update keys insert as new current rows; unmatched current
    * rows and all already-closed rows pass through untouched. A key
    * whose versions are ALL closed (a retired dimension member) has no
    * current row, so an update for it RE-ACTIVATES the key: a fresh
    * current version opens at `effective` and the closed history stays
    * intact — the standard SCD2 answer to a member coming back (spec'd).
    * Re-activation carries its own staleness rule: an update whose
    * effective date is at or before the key's latest closure
    * (`max(valid_to)`) is an out-of-order CDC replay — opening a
    * current row there would OVERLAP the closed interval and a
    * point-in-time query would return two rows for one key — so it is
    * dropped, mirroring the current-row stale rule (spec'd).
    *
    * Scale shape: only the CURRENT rows (live dimension cardinality)
    * plus one `max(valid_to)` row per UPDATE key (the closed side is
    * semi-join-bounded to the batch's keys before aggregating, so the
    * closed majority contributes a scan but no large exchange) join the
    * batch — and the fold is emitted in ONE `inline` expansion (the
    * close+reopen pair comes from the single joined row, not a second
    * join). To make the WRITE pruned too, partition the table by
    * `date(validToCol)` (null → the live `__HIVE_DEFAULT_PARTITION__`):
    * a batch then rewrites the live partition plus the one closed-date
    * partition it creates, and [[mergeInto]]'s dynamic-overwrite
    * staging applies unchanged. */
  def scd2Apply(history: DataFrame, updates: DataFrame, keys: Seq[String],
                tracked: Seq[String], effectiveCol: String,
                validFromCol: String = "valid_from",
                validToCol: String = "valid_to"): DataFrame = {
    val outCols = (keys ++ tracked) :+ validFromCol :+ validToCol
    val dateType = history.schema(validFromCol).dataType
    val closed = history.filter(col(validToCol).isNotNull)
    val current = history.filter(col(validToCol).isNull)

    // latest closure per update key (retired-key staleness bound):
    // bounded by the batch via the semi join, one row per matched key
    val keyBound = closed.alias("cl")
      .join(updates.select(keys.map(col): _*).distinct(), keys.toSeq, "left_semi")
      .groupBy(keys.map(col): _*)
      .agg(max(col(validToCol)).as("_max_vt"))

    // the per-key STATE row: the current version (if any) + the latest
    // closure bound (if any); `_t_present` marks side presence after the
    // outer join with updates (valid_from is null on retired-only rows,
    // so it can no longer serve as the probe)
    val state = current.alias("c").join(keyBound.alias("b"),
        keys.map(k => col(s"c.$k") <=> col(s"b.$k")).reduce(_ && _),
        "full_outer")
      .select(keys.map(k => coalesce(col(s"c.$k"), col(s"b.$k")).as(k)) ++
        tracked.map(c => col(s"c.$c").as(c)) ++
        Seq(col(s"c.$validFromCol").as(validFromCol),
          col("b._max_vt").as("_max_vt"), lit(true).as("_t_present")): _*)

    val joined = state.alias("t").join(updates.alias("u"),
      keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _),
      "full_outer")
    // null-safe per-column compare: a tracked value changing to/from
    // null is a real change; null staying null is not
    val changed = tracked.map(c => !(col(s"t.$c") <=> col(s"u.$c")))
      .reduce(_ || _)
    val stale = col(s"u.$effectiveCol") <= col(s"t.$validFromCol")
    val tAbsent = col("t._t_present").isNull
    val hasCurrent = col(s"t.$validFromCol").isNotNull
    // effective is non-null by contract on every real update row, so a
    // null means the update side of the full-outer join is absent
    val uMissing = col(s"u.$effectiveCol").isNull
    val reactStale = col("t._max_vt").isNotNull &&
      col(s"u.$effectiveCol") <= col("t._max_vt")

    def row(side: String, from: Column, to: Column) = struct(
      (keys ++ tracked).map(c => col(s"$side.$c").as(c)) ++
        Seq(from.as(validFromCol), to.as(validToCol)): _*)
    val tRow = row("t", col(s"t.$validFromCol"), lit(null).cast(dateType))
    val tClosed = row("t", col(s"t.$validFromCol"), col(s"u.$effectiveCol"))
    val uRow = row("u", col(s"u.$effectiveCol"), lit(null).cast(dateType))
    val noRows = slice(array(tRow), 1, 0) // typed empty: emit nothing

    val emitted = joined.select(inline(
      when(tAbsent, array(uRow)) // brand-new key
        .when(uMissing, when(hasCurrent, array(tRow)).otherwise(noRows))
        .when(hasCurrent && (stale || !changed), array(tRow))
        .when(hasCurrent, array(tClosed, uRow))
        // retired key: re-activate unless the update predates the
        // latest closure (out-of-order replay must not fork history)
        .when(reactStale, noRows)
        .otherwise(array(uRow))))

    closed.select(outCols.map(col): _*).unionByName(emitted)
  }
}
