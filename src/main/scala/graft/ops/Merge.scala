package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
