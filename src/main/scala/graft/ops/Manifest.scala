package graft.ops

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Snapshot-isolated parquet tables via a manifest protocol — the
  * table-format answer to the commit-phase crash window that
  * [[Merge.mergeInto]] / [[Layout.compact]] document: dynamic partition
  * overwrite DELETES target directories before renaming replacements,
  * so a crash inside commitJob can lose a partition. Here nothing is
  * ever deleted or renamed in place:
  *
  *  - DATA FILES are immutable. Every write job lands under a fresh
  *    `data/<uuid>/` prefix; an upsert/delete/compact REWRITES affected
  *    rows into new files and leaves the old files on disk.
  *  - A MANIFEST (itself a small parquet relation under
  *    `_manifests/m-<uuid>/`) lists the live files of one snapshot,
  *    with per-file stats for pruning.
  *  - COMMIT is ONE atomic primitive: exclusive create
  *    (`FileSystem.create(path, overwrite = false)`) of a version
  *    pointer file `_versions/v<n>` naming the manifest. Exclusive
  *    create is atomic on HDFS and local FS, so two writers racing to
  *    the same version cannot both win — the loser gets
  *    FileAlreadyExistsException (optimistic concurrency), and a crash
  *    ANYWHERE before the pointer create leaves the previous snapshot
  *    fully intact (orphaned staging files are garbage, not damage —
  *    [[vacuumOrphans]] reclaims them).
  *  - READERS resolve max(`_versions/`) once and then read a frozen
  *    file list: no torn reads during concurrent writes, and any older
  *    version stays readable until vacuumed ([[readVersion]] — time
  *    travel).
  *
  * Partitioning WITHOUT Hive directories: the partition column stays a
  * normal data column (no information is moved into paths, so none of
  * the escaping/null-sentinel machinery applies). Writes cluster rows
  * by the partition column (`repartition(partitionCol)`), and the
  * manifest records each file's distinct partition-value set (string
  * rendering, capped at [[ValuesCap]] with an overflow flag — an
  * overflowed file is simply always a rewrite candidate). Pruning is
  * EQUALITY on that set — type-agnostic, no ordering semantics, no
  * false negatives by construction; the same file-skipping contract as
  * Delta/Iceberg data-file stats.
  *
  * Driver-side state is one row per LIVE FILE (a 100 TB table at
  * ~128 MB files ≈ 8×10⁵ entries), the same order as Delta's snapshot
  * state, and far below the per-ROW state this would take without a
  * manifest.
  */
/** One live data file of a snapshot (top-level so its Spark `Encoder`
  * whole-stage-codegens — nested-in-object case classes fall back to
  * interpreted projections). `values` is the file's distinct
  * partition-value set as strings (null partition value tracked by
  * `has_null`); `overflow` = the set was capped, never prune this file.
  * `schema_ddl` repeats the table schema on every entry so an
  * all-rows-deleted snapshot still knows its schema. */
case class ManifestEntry(path: String, values: Seq[String],
                         has_null: Boolean, overflow: Boolean,
                         rows: Long, bytes: Long, schema_ddl: String)

object Manifest {

  /** Max distinct partition values recorded per file; beyond it the
    * file is marked overflow and never pruned out. */
  val ValuesCap: Int = 64

  private val ManifestsDir = "_manifests"
  private val VersionsDir = "_versions"
  private val DataDir = "data"

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val root = new Path(dir)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  // -------- version pointers --------

  private def versionPath(root: Path, v: Long): Path =
    new Path(new Path(root, VersionsDir), f"v$v%08d")

  /** All committed versions, ascending (empty = no table). */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val (fs, root) = fsOf(spark, dir)
    val vd = new Path(root, VersionsDir)
    if (!fs.exists(vd)) Seq.empty
    else fs.listStatus(vd).map(_.getPath.getName)
      .filter(_.matches("v\\d{8}")).map(_.drop(1).toLong).sorted.toSeq
  }

  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    versions(spark, dir).lastOption

  private def readPointer(fs: FileSystem, root: Path, v: Long): String = {
    val in = fs.open(versionPath(root, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** The atomic commit: exclusive-create `_versions/v<n>` pointing at
    * `manifestName`. Throws if `v` is already claimed (lost race —
    * re-read the table and retry the whole operation). */
  private def commit(fs: FileSystem, root: Path, v: Long,
                     manifestName: String): Unit = {
    fs.mkdirs(new Path(root, VersionsDir))
    val out = fs.create(versionPath(root, v), false) // atomic CAS
    try out.write(manifestName.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  // -------- manifest relations --------

  private type Entry = ManifestEntry
  private def Entry(path: String, values: Seq[String], has_null: Boolean,
                    overflow: Boolean, rows: Long, bytes: Long,
                    schema_ddl: String): Entry =
    ManifestEntry(path, values, has_null, overflow, rows, bytes, schema_ddl)

  /** Every manifest leads with a schema SENTINEL entry (`path = ""`, no
    * file): a snapshot whose rows were all deleted still knows its
    * schema. [[readManifest]] returns only real file entries; the
    * schema rides separately. */
  private def writeManifest(spark: SparkSession, root: Path,
                            entries: Seq[Entry], ddl: String): String = {
    import spark.implicits._
    val name = s"m-${UUID.randomUUID()}"
    val dir = new Path(new Path(root, ManifestsDir), name).toString
    val sentinel = Entry("", Seq.empty, has_null = false, overflow = false,
      rows = 0L, bytes = 0L, schema_ddl = ddl)
    (sentinel +: entries).toDF().coalesce(1).write.parquet(dir)
    name
  }

  /** (file entries, table schema DDL) of one committed version. */
  private def readManifest(spark: SparkSession, root: Path,
                           v: Long): (Seq[Entry], String) = {
    import spark.implicits._
    val (fs, _) = (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
    val name = readPointer(fs, root, v)
    val all = spark.read
      .parquet(new Path(new Path(root, ManifestsDir), name).toString)
      .as[Entry].collect().toSeq
    (all.filter(_.path.nonEmpty), schemaOf(all, None))
  }

  // -------- batch write + stats --------

  /** Write `df` as a fresh immutable batch and return its entries.
    * Rows are clustered by the partition column so per-file value sets
    * stay tight (one shuffle — the price of pruning on every later
    * rewrite); stats come from one read-back of the batch (a single
    * projected column), never from path names. */
  private def writeBatch(spark: SparkSession, root: Path, df: DataFrame,
                         partitionCol: String): Seq[Entry] = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchDir = new Path(new Path(root, DataDir), s"b-${UUID.randomUUID()}")
    df.repartition(col(partitionCol)).write.parquet(batchDir.toString)
    val ddl = nullableDdl(df.schema)
    val rootUri = batchDir.toUri.getPath // file-scheme-free for relativizing
    val stats = spark.read.parquet(batchDir.toString)
      .groupBy(input_file_name().as("file"))
      .agg(
        slice(sort_array(collect_set(col(partitionCol).cast("string"))),
          1, ValuesCap + 1).as("values"),
        max(col(partitionCol).isNull.cast("int")).as("has_null"),
        count(lit(1)).as("rows"))
      .collect()
    stats.map { r =>
      val fileUri = new Path(r.getString(0)).toUri.getPath
      require(fileUri.startsWith(rootUri), s"unexpected file path $fileUri")
      val rel = s"$DataDir/${batchDir.getName}${fileUri.stripPrefix(rootUri)}"
      val vals = r.getSeq[String](1)
      Entry(rel,
        values = vals.take(ValuesCap),
        has_null = r.getInt(2) == 1,
        overflow = vals.length > ValuesCap,
        rows = r.getLong(3),
        bytes = fs.getFileStatus(new Path(root, rel)).getLen,
        schema_ddl = ddl)
    }.toSeq
  }

  private def readEntries(spark: SparkSession, root: Path,
                          entries: Seq[Entry], ddl: String): DataFrame = {
    val schema = DataType.fromDDL(ddl).asInstanceOf[StructType]
    if (entries.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema)
        .parquet(entries.map(e => new Path(root, e.path).toString): _*)
  }

  /** Top-level nullable rendering (nullability is not a parquet
    * round-trip invariant, so the table schema is recorded nullable). */
  private def nullableDdl(s: StructType): String =
    StructType(s.fields.map(_.copy(nullable = true))).toDDL

  private def schemaOf(entries: Seq[Entry], fallback: Option[String]): String =
    entries.headOption.map(_.schema_ddl)
      .orElse(fallback)
      .getOrElse(throw new IllegalStateException("empty manifest with no schema"))

  // -------- public surface --------

  /** Create the table at `dir` as version 1. Fails if a version exists. */
  def create(spark: SparkSession, dir: String, df: DataFrame,
             partitionCol: String): Unit = {
    val (fs, root) = fsOf(spark, dir)
    require(latestVersion(spark, dir).isEmpty, s"table already exists at $dir")
    val entries = writeBatch(spark, root, df, partitionCol)
    commit(fs, root, 1L,
      writeManifest(spark, root, entries, nullableDdl(df.schema)))
  }

  /** Read the latest snapshot. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val v = latestVersion(spark, dir)
      .getOrElse(throw new IllegalArgumentException(s"no table at $dir"))
    readVersion(spark, dir, v)
  }

  /** Time travel: read a specific committed version. Valid until that
    * version's files are [[vacuumOrphans]]ed. */
  def readVersion(spark: SparkSession, dir: String, v: Long): DataFrame = {
    val (_, root) = fsOf(spark, dir)
    val (entries, ddl) = readManifest(spark, root, v)
    readEntries(spark, root, entries, ddl)
  }

  /** Append `df` as new files (no rewrite of existing data). */
  def append(spark: SparkSession, dir: String, df: DataFrame,
             partitionCol: String): Unit = {
    val (fs, root) = fsOf(spark, dir)
    val v = latestVersion(spark, dir)
      .getOrElse(throw new IllegalArgumentException(s"no table at $dir"))
    val (old, ddl) = readManifest(spark, root, v)
    require(nullableDdl(df.schema) == ddl,
      s"append schema ${nullableDdl(df.schema)} != table schema $ddl")
    val entries = writeBatch(spark, root, df, partitionCol)
    commit(fs, root, v + 1, writeManifest(spark, root, old ++ entries, ddl))
  }

  /** Which live files can hold any of the update batch's partition
    * values — equality on the recorded value sets; overflowed files and
    * (for a null-bearing batch) null-bearing files always qualify. */
  private def candidates(entries: Seq[Entry], wanted: Set[String],
                         wantNull: Boolean): Seq[Entry] =
    entries.filter(e => e.overflow ||
      (wantNull && e.has_null) ||
      e.values.exists(wanted.contains))

  /** MERGE (upsert) with [[Merge.mergeInto]]'s row semantics — update
    * rows win column-wise (`coalesce(update, target)`), new keys
    * insert — under snapshot isolation: only files whose recorded
    * partition-value sets intersect the batch are read and rewritten,
    * the rest of the table is carried by reference in the new manifest,
    * and the swap is the atomic pointer create. A crash at ANY point
    * leaves the previous snapshot intact (rerun = same result, one more
    * version). As in mergeInto, a key's partition value must be stable
    * across updates. */
  def upsert(spark: SparkSession, dir: String, updates: DataFrame,
             keys: Seq[String], partitionCol: String): Unit = {
    rewrite(spark, dir, updates, partitionCol) { (target, batch) =>
      val dataCols = batch.columns
      target.alias("t")
        .join(batch.alias("u"),
          keys.map(k => col(s"u.$k") <=> col(s"t.$k")).reduce(_ && _),
          "full_outer")
        .select(dataCols.map(c =>
          coalesce(col(s"u.$c"), col(s"t.$c")).as(c)): _*)
    }
  }

  /** Keyed DELETE under snapshot isolation. `deletes` carries
    * `keys ++ partitionCol`. A file (or partition) whose rows are all
    * deleted simply drops out of the manifest — no emptied-directory
    * special case, the one [[Merge.deleteWhere]] needs. */
  def delete(spark: SparkSession, dir: String, deletes: DataFrame,
             keys: Seq[String], partitionCol: String): Unit = {
    rewrite(spark, dir, deletes, partitionCol) { (target, batch) =>
      target.join(batch.select(keys.map(col): _*).distinct(),
        keys.toSeq, "left_anti")
    }
  }

  /** Shared copy-on-write shape for [[upsert]]/[[delete]]: prune to
    * candidate files, apply `merge(target, batch)`, write the result as
    * a new batch, commit old−candidates+new. */
  private def rewrite(spark: SparkSession, dir: String, batch: DataFrame,
                      partitionCol: String)
                     (merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    val (fs, root) = fsOf(spark, dir)
    val v = latestVersion(spark, dir)
      .getOrElse(throw new IllegalArgumentException(s"no table at $dir"))
    val (old, ddl) = readManifest(spark, root, v)
    // one row per touched partition — bounded by the batch, as in mergeInto
    val touched = batch.select(col(partitionCol).cast("string")).distinct()
      .collect().map(r => Option(r.getString(0)))
    val wanted = touched.flatten.toSet
    val wantNull = touched.contains(None)
    val cands = candidates(old, wanted, wantNull)
    val target = readEntries(spark, root, cands, ddl)
    val merged = merge(target, batch)
    val newEntries = if (merged.isEmpty) Seq.empty
                     else writeBatch(spark, root, merged, partitionCol)
    val candPaths = cands.map(_.path).toSet
    val kept = old.filterNot(e => candPaths.contains(e.path))
    commit(fs, root, v + 1,
      writeManifest(spark, root, kept ++ newEntries, ddl))
  }

  /** OPTIMIZE: rewrite the snapshot's small files (< `smallBytes`) into
    * ~`targetBytes` files, swap atomically. Untouched files carry over
    * by reference. */
  def compact(spark: SparkSession, dir: String, partitionCol: String,
              smallBytes: Long = 32L << 20,
              targetBytes: Long = 128L << 20): Unit = {
    val (fs, root) = fsOf(spark, dir)
    val v = latestVersion(spark, dir)
      .getOrElse(throw new IllegalArgumentException(s"no table at $dir"))
    val (old, ddl) = readManifest(spark, root, v)
    val small = old.filter(_.bytes < smallBytes)
    if (small.size < 2) return // nothing to gain
    val total = small.map(_.bytes).sum
    val nOut = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val compacted = readEntries(spark, root, small, ddl).coalesce(nOut)
    val newEntries = if (compacted.isEmpty) Seq.empty
                     else writeBatch(spark, root, compacted, partitionCol)
    val smallPaths = small.map(_.path).toSet
    commit(fs, root, v + 1,
      writeManifest(spark, root,
        old.filterNot(e => smallPaths.contains(e.path)) ++ newEntries, ddl))
  }

  /** Reclaim files not referenced by any of the newest `keepVersions`
    * manifests, and drop older version pointers + manifests. Time
    * travel reaches back `keepVersions` snapshots afterwards. Safe to
    * run concurrently with readers OF THOSE VERSIONS only. */
  def vacuumOrphans(spark: SparkSession, dir: String,
                    keepVersions: Int = 1): Long = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val (fs, root) = fsOf(spark, dir)
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no table at $dir")
    val keep = vs.takeRight(keepVersions)
    val live: Set[String] =
      keep.flatMap(v => readManifest(spark, root, v)._1.map(_.path)).toSet
    val liveManifests: Set[String] =
      keep.map(v => readPointer(fs, root, v)).toSet
    var reclaimed = 0L
    // data files outside the union of kept snapshots
    val dataRoot = new Path(root, DataDir)
    if (fs.exists(dataRoot)) {
      val it = fs.listFiles(dataRoot, true)
      val doomed = scala.collection.mutable.ArrayBuffer[Path]()
      while (it.hasNext) {
        val st = it.next()
        val rel = s"$DataDir${st.getPath.toUri.getPath.stripPrefix(dataRoot.toUri.getPath)}"
        if (st.isFile && !live.contains(rel)) doomed += st.getPath
      }
      doomed.foreach { p => reclaimed += 1; fs.delete(p, false) }
      // sweep now-empty batch dirs
      fs.listStatus(dataRoot).foreach { st =>
        if (st.isDirectory && fs.listStatus(st.getPath).isEmpty)
          fs.delete(st.getPath, false)
      }
    }
    // retired manifests + pointers
    val md = new Path(root, ManifestsDir)
    if (fs.exists(md)) fs.listStatus(md).foreach { st =>
      if (!liveManifests.contains(st.getPath.getName)) {
        reclaimed += 1; fs.delete(st.getPath, true)
      }
    }
    vs.dropRight(keepVersions).foreach { v =>
      fs.delete(versionPath(root, v), false)
    }
    reclaimed
  }
}
