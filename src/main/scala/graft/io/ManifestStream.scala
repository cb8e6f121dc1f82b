package graft.io

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, GraftStreamBridge, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.execution.datasources.DataSourceUtils
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.Manifest

/** A [[Manifest]] table as a Structured Streaming SOURCE —
  * `spark.readStream.format("graft-manifest").load(tableDir)` — the
  * upstream half of CDC that [[graft.ops.ChangeFeed]]'s poll loop serves
  * imperatively. Offsets are table VERSIONS, so a micro-batch is a
  * version range `(start, end]` and replay after a crash recomputes the
  * exact same rows from the exact same snapshots: the engine's offset
  * log plus manifest snapshot isolation gives end-to-end exactly-once
  * into any idempotent/transactional sink with zero source-side state
  * beyond one retention pin.
  *
  * Two modes (`option("mode", ...)`):
  *
  *  - `cdc` (default): each batch carries the table columns plus
  *    `_change` ('insert' | 'delete') and `_commit_version`. A commit's
  *    rows come from [[Manifest.changes]] on that single version step,
  *    so an upsert arrives as its delete+insert pair, exactly like the
  *    poll feed. The FIRST batch (no `afterVersion`) is the standard
  *    CDC initial load: the full snapshot as inserts, labeled with the
  *    snapshot's version.
  *  - `append`: table columns plus `_commit_version`, served by the
  *    [[Manifest.appendedBetween]] fast path — only each commit's ADDED
  *    files are ever read (the streaming-ingest shape: at 100 TB the
  *    per-trigger read is O(new data), never O(table)). Any in-range
  *    rewrite (upsert/delete/compact/cluster) fails the batch LOUDLY
  *    with a pointer at cdc mode — silently treating rewritten rows as
  *    fresh inserts is the corruption this mode refuses.
  *
  * Options:
  *  - `afterVersion`: exclusive anchor — start from the changes AFTER
  *    this retained version instead of an initial snapshot load (the
  *    cursor convention of [[graft.ops.ChangeFeed.poll]], NOT Delta's
  *    inclusive `startingVersion`; the name differs deliberately).
  *  - `maxVersionsPerTrigger` (default 64): admission control — at most
  *    this many commits per micro-batch, so a backlogged stream catches
  *    up in bounded, checkpointable steps instead of one giant batch.
  *  - `maxBytesPerTrigger` (off by default): BYTES-based admission on
  *    top of the version cap — commits vary by orders of magnitude in
  *    size, so a catch-up batch additionally stops before the commit
  *    that would push its added-data bytes past this budget (per-commit
  *    sizes come from the delta sidecars; a sidecar-less oversized
  *    commit fills a trigger alone; at least one commit always admits).
  *
  * Retention: the source owns one named pin (derived from the query's
  * checkpoint source path, stable across restarts) and advances it on
  * every committed batch, so vacuum can never drop the snapshot the
  * next batch diffs against — restart state IS the pin, no extra
  * bookkeeping files. Decommission a stream with [[ManifestStream.retire]].
  *
  * Schema is FIXED at stream start (the engine analyzes the plan once):
  * a mid-stream [[Manifest.evolve]] widening keeps batches planning —
  * new columns are simply not selected — and any incompatible change
  * (dropped/retyped column) fails loudly with a restart hint rather
  * than mis-typing rows. */
object ManifestStream {

  val ChangeCol = "_change"
  val VersionCol = "_commit_version"

  private[io] def optCI(params: Map[String, String], key: String)
      : Option[String] =
    params.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  /** The stream's retention-pin name on the base table — derived from
    * the engine's per-source checkpoint path (`<ckpt>/sources/<i>`), so
    * a restarted query reuses the pin and two queries never collide.
    * The path is FS-QUALIFIED before hashing: the engine hands
    * createSource a resolved URI (`file:/...`), while [[retire]] gets
    * the user's raw string — both must land on the same pin. */
  private[io] def pinName(spark: SparkSession, metadataPath: String): String = {
    val p = new org.apache.hadoop.fs.Path(metadataPath)
    val u = p.getFileSystem(
      spark.sparkContext.hadoopConfiguration).makeQualified(p).toUri
    // component-wise canonical form: Hadoop renders a null vs empty
    // authority differently ("file:/x" vs "file:///x") depending on
    // whether the input string already carried a scheme
    val canon =
      s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}${u.getPath}"
    "stream-" + java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes(StandardCharsets.UTF_8))
      .take(6).map("%02x".format(_)).mkString
  }

  /** Decommission a stopped stream: drop its retention pin so vacuum
    * stops waiting for it (`sourceIndex` = position in the query's
    * source list; 0 for the usual single-source query). */
  def retire(spark: SparkSession, tableDir: String,
             checkpointLocation: String, sourceIndex: Int = 0): Unit =
    Manifest.unpin(spark, tableDir,
      pinName(spark,
        s"${checkpointLocation.stripSuffix("/")}/sources/$sourceIndex"))

  private[io] def afterVersionOpt(params: Map[String, String]): Option[Long] =
    optCI(params, "afterVersion").map { s =>
      s.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"afterVersion must be a version number, got '$s'"))
    }

  /** The stream's anchor: `afterVersion` verbatim, or `afterTimestamp`
    * resolved to the newest version committed at or before that time
    * (same spellings and in-commit-timestamp resolution as the batch
    * reader's `timestampAsOf`) — "stream every change since T".
    * `resolve = false` checks option consistency and the timestamp
    * SPELLING only (the load-time validation hook) without paying the
    * O(retained versions) pointer sweep twice per stream start. */
  private[io] def anchorOpt(spark: SparkSession, dir: String,
                            params: Map[String, String],
                            resolve: Boolean = true): Option[Long] = {
    val av = afterVersionOpt(params)
    val at = optCI(params, "afterTimestamp")
    require(av.isEmpty || at.isEmpty,
      "afterVersion and afterTimestamp are mutually exclusive")
    if (!resolve) {
      at.foreach(ManifestRelation.parseTsMillis(spark, _))
      av
    } else av.orElse(at.map(t => ManifestRelation.versionAtTime(spark, dir, t)))
  }

  /** The ONE partition column from `.partitionBy` and/or the
    * `partitionCol` option — shared by the sink and the batch writer.
    * Agreement between the two spellings is CASE-INSENSITIVE, like
    * every other column comparison in the stack. */
  private[io] def onePartitionCol(partitionBy: Seq[String],
                                  opt: Option[String],
                                  who: String): String =
    (partitionBy, opt) match {
      case (Seq(one), None) => one
      case (Seq(), Some(c)) => c
      case (Seq(one), Some(c)) if one.equalsIgnoreCase(c) => c
      case (ps, o) => throw new IllegalArgumentException(
        s"$who needs exactly ONE partition column via .partitionBy or " +
          s"""option("partitionCol") — got partitionBy=$ps, option=$o""")
    }

  private[io] def maxVersionsOpt(params: Map[String, String]): Long =
    optCI(params, "maxVersionsPerTrigger").map { s =>
      s.toLongOption.filter(_ >= 1).getOrElse(
        throw new IllegalArgumentException(
          s"maxVersionsPerTrigger must be a positive integer, got '$s'"))
    }.getOrElse(64L)

  private[io] def maxBytesOpt(params: Map[String, String]): Option[Long] =
    optCI(params, "maxBytesPerTrigger").map { s =>
      s.toLongOption.filter(_ >= 1).getOrElse(
        throw new IllegalArgumentException(
          s"maxBytesPerTrigger must be a positive byte count, got '$s'"))
    }

  /** Schema + full option validation — runs at `.load()` time (the
    * provider's sourceSchema hook), so a malformed option fails in the
    * caller's stack, not asynchronously on the stream thread. */
  private[io] def sourceSchema(spark: SparkSession,
                               params: Map[String, String]): StructType = {
    val dir = optCI(params, "path").getOrElse(throw new IllegalArgumentException(
      "graft-manifest source needs a table path: .load(dir) or option(\"path\", dir)"))
    val mode = optCI(params, "mode").getOrElse("cdc").toLowerCase
    require(mode == "cdc" || mode == "append",
      s"graft-manifest mode must be 'cdc' or 'append', got '$mode'")
    anchorOpt(spark, dir, params, resolve = false)
    maxVersionsOpt(params); maxBytesOpt(params)
    val base = Manifest.tableSchema(spark, dir)
    Seq(ChangeCol, VersionCol).foreach { c =>
      // case-INSENSITIVE like every other column comparison in the
      // stack — withColumn resolves case-insensitively, so a column
      // differing only by case would be silently overwritten, not kept
      require(!base.fieldNames.exists(_.equalsIgnoreCase(c)),
        s"table column '$c' collides with the graft-manifest metadata column")
    }
    val extras =
      if (mode == "cdc") Seq(StructField(ChangeCol, StringType, nullable = false),
        StructField(VersionCol, LongType, nullable = false))
      else Seq(StructField(VersionCol, LongType, nullable = false))
    StructType(base.map(_.copy(nullable = true)) ++ extras)
  }
}

class ManifestStreamProvider extends StreamSourceProvider
    with StreamSinkProvider with RelationProvider
    with CreatableRelationProvider with DataSourceRegister {
  import ManifestStream._

  override def shortName(): String = "graft-manifest"

  /** `spark.read.format("graft-manifest")` — the BATCH read half (and
    * the resolution target of `CREATE TABLE ... USING graft-manifest`):
    * the latest snapshot, or a time-travel one via `versionAsOf` /
    * `timestampAsOf`. Full contract on [[ManifestRelation]]. */
  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val dir = optCI(parameters, "path").getOrElse(
      throw new IllegalArgumentException(
        "graft-manifest needs a table path: .load(dir) or option(\"path\", dir)"))
    val version = ManifestRelation.resolveVersion(spark, dir, parameters)
    ManifestRelation.forRead(spark, dir, optCI(parameters, "partitionCol"),
      version)
  }

  /** `df.write.format("graft-manifest")` — the BATCH write half: every
    * SaveMode lands as ONE atomic manifest commit (crash leaves the
    * previous snapshot intact; Overwrite keeps old versions
    * time-travelable until vacuum). Full contract on
    * [[ManifestRelation]]. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val dir = optCI(parameters, "path").getOrElse(
      throw new IllegalArgumentException(
        "graft-manifest needs a table path: .save(dir) or option(\"path\", dir)"))
    require(optCI(parameters, "versionAsOf").isEmpty &&
      optCI(parameters, "timestampAsOf").isEmpty,
      "versionAsOf/timestampAsOf are read options — a write always " +
        "commits the next version")
    val partitionCol = onePartitionCol(
      parameters.get(DataSourceUtils.PARTITIONING_COLUMNS_KEY)
        .map(DataSourceUtils.decodePartitioningColumns(_).toSeq)
        .getOrElse(Nil),
      optCI(parameters, "partitionCol"), "graft-manifest write")
    def listOpt(key: String) = optCI(parameters, key).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val statsCols = listOpt("statsCols")
    val bloomCols = listOpt("bloomCols")
    val mergeSchema = optCI(parameters, "mergeSchema").exists(_.toBoolean)
    val exists = Manifest.latestVersion(spark, dir).isDefined
    // stats/bloom configuration is a CREATE-time contract (StagedWrite's
    // rule): reconfiguring an existing table would silently fork its
    // pruning semantics, so refuse rather than ignore — but ONLY on
    // modes that would actually write (SaveMode.Ignore's contract is to
    // no-op on an existing target, stale options included)
    def refuseLateConfig(): Unit =
      require(statsCols.isEmpty && bloomCols.isEmpty,
        s"statsCols/bloomCols configure a table at CREATE only; $dir " +
          "already exists with its own pruning configuration")
    mode match {
      case _ if !exists =>
        Manifest.create(spark, dir, data, partitionCol, statsCols,
          bloomCols = bloomCols)
      case SaveMode.ErrorIfExists =>
        throw new IllegalArgumentException(
          s"graft-manifest table already exists at $dir " +
            "(SaveMode.ErrorIfExists) — use append or overwrite")
      case SaveMode.Ignore => ()
      case SaveMode.Append =>
        refuseLateConfig()
        Manifest.append(spark, dir, data, partitionCol,
          mergeSchema = mergeSchema)
      case SaveMode.Overwrite =>
        refuseLateConfig()
        Manifest.overwrite(spark, dir, data, partitionCol)
    }
    createRelation(sqlContext, parameters)
  }

  /** `writeStream.format("graft-manifest")` — the sink half: each
    * micro-batch commits through [[Manifest.appendIfAbsent]] (or
    * [[Manifest.upsertIfAbsent]] when `keys` is set), with the engine's
    * `(queryId, batchId)` as the transaction marker, so a
    * checkpoint-replayed batch no-ops against its own marker and the
    * source→sink chain is exactly-once END TO END with both halves on
    * manifest tables. Options: `path`, `partitionCol` (or a single
    * `.partitionBy(...)` column), `keys` (comma-separated — switches to
    * keyed upsert), `statsCols` (comma-separated min/max stat columns,
    * first batch only), `mergeSchema` (append path only). Output modes:
    * Append for the append path; Append or Update for the keyed path
    * (an update-mode aggregation re-emits full rows per changed key —
    * exactly what the upsert folds); Complete is refused (rewriting the
    * whole table every trigger is a batch job, not a stream). */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val dir = optCI(parameters, "path").getOrElse(
      throw new IllegalArgumentException(
        "graft-manifest sink needs a table path: option(\"path\", dir)"))
    val partitionCol = onePartitionCol(partitionColumns,
      optCI(parameters, "partitionCol"), "graft-manifest sink")
    val keys = optCI(parameters, "keys").toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val statsCols = optCI(parameters, "statsCols").toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val mergeSchema = optCI(parameters, "mergeSchema").exists(_.toBoolean)
    val cdc = optCI(parameters, "cdc").exists(_.toBoolean)
    require(outputMode != OutputMode.Complete(),
      "graft-manifest sink refuses Complete mode: rewriting the full " +
        "result every trigger is a batch overwrite, not a stream — use " +
        "foreachBatch with Manifest.overwritePartitions if that is really wanted")
    // cdc-specific refusals FIRST, so their targeted messages actually
    // surface (the generic keyed/mergeSchema checks below would
    // otherwise shadow them)
    require(!cdc || keys.nonEmpty,
      "cdc mode applies keyed deletes — option(\"keys\", ...) is required")
    require(keys.nonEmpty || outputMode == OutputMode.Append(),
      "Update mode needs option(\"keys\", ...) — without keys an " +
        "update-mode batch would blind-append re-emitted rows")
    require(!(keys.nonEmpty && mergeSchema) || cdc,
      "mergeSchema applies to the append path only (or to the cdc " +
        "sink, where it folds a source schema evolution into the target)")
    val schemaFrom = optCI(parameters, "replicateSchemaFrom")
    require(schemaFrom.isEmpty || (cdc && mergeSchema),
      "replicateSchemaFrom folds source rename/drop provenance into " +
        "the target — it needs cdc mode with mergeSchema")
    new ManifestSink(sqlContext.sparkSession, dir, partitionCol, keys,
      statsCols, mergeSchema, cdc, schemaFrom)
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    require(schema.isEmpty,
      "graft-manifest reads the table's own schema; a user schema cannot apply")
    (shortName(), ManifestStream.sourceSchema(sqlContext.sparkSession, parameters))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val dir = optCI(parameters, "path").get // validated in sourceSchema
    val mode = optCI(parameters, "mode").getOrElse("cdc").toLowerCase
    val after = anchorOpt(spark, dir, parameters)
    val maxV = maxVersionsOpt(parameters)
    val maxB = maxBytesOpt(parameters)
    new ManifestStreamSource(spark, dir, mode, after, maxV,
      ManifestStream.sourceSchema(spark, parameters),
      pinName(spark, metadataPath), maxB)
  }
}

class ManifestStreamSource(spark: SparkSession, tableDir: String,
                           mode: String, afterVersion: Option[Long],
                           maxVersionsPerTrigger: Long,
                           override val schema: StructType,
                           pin: String,
                           maxBytesPerTrigger: Option[Long] = None)
    extends Source with SupportsAdmissionControl {
  import ManifestStream._

  // Anchor the pin BEFORE the first trigger so a vacuum between stream
  // start and the first commit can never drop the snapshot the initial
  // batch reads. A restarted query finds its previous pin (advanced by
  // commit()) and must NOT regress it to `latest`; a brand-new query
  // pins the anchor it will actually start from.
  locally {
    val retained = Manifest.versions(spark, tableDir)
    require(retained.nonEmpty, s"no manifest table at $tableDir")
    afterVersion.foreach { a =>
      require(retained.contains(a),
        s"afterVersion v$a is not retained (have v${retained.head}.." +
          s"v${retained.last}) — it cannot anchor a change feed")
    }
    if (!Manifest.pins(spark, tableDir).contains(pin))
      Manifest.pin(spark, tableDir, pin,
        afterVersion.getOrElse(retained.last))
  }

  private def ver(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  // Per-commit added-bytes memo for byte-paced admission: commits are
  // immutable, so a version's sidecar size never changes once its
  // pointer exists — without this, every latestOffset poll re-reads
  // the pointer + delta sidecar of EVERY backlog commit, O(backlog)
  // driver filesystem round-trips per trigger on remote stores.
  // Entries below the advancing floor are evicted, so the memo stays
  // O(current backlog). Sidecar-less commits memoize the
  // trigger-filling sentinel.
  private val addedBytesMemo =
    scala.collection.mutable.TreeMap.empty[Long, Long]
  private def addedBytesMemoized(v: Long): Long =
    addedBytesMemo.get(v).getOrElse {
      // only a CACHEABLE answer memoizes: a sidecar that exists but
      // failed to read may be a transient store error, and pinning its
      // trigger-filling sentinel would mis-pace the stream forever
      val (sz, cacheable) =
        Manifest.commitAddedBytesCacheable(spark, tableDir, v)
      val value = sz.getOrElse(Long.MaxValue / 4)
      if (cacheable) addedBytesMemo.update(v, value)
      value
    }
  private def evictBelow(floor: Long): Unit =
    while (addedBytesMemo.nonEmpty && addedBytesMemo.firstKey <= floor)
      addedBytesMemo.remove(addedBytesMemo.firstKey)

  /** The authoritative pacing hook ([[SupportsAdmissionControl]], the
    * path MicroBatchExecution prefers for V1 sources that offer it —
    * Delta's DeltaSource shape): the ENGINE supplies the true start
    * offset from its own log, so catch-up pacing is exact across
    * restarts — no floor has to be guessed from the (commit-lagging)
    * retention pin, which could otherwise offer an offset at or below
    * the committed one after a restart and stall the paced stream.
    * `null` start = nothing planned yet (the initial-snapshot / first
    * anchored batch); `null` return = no new data. */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val latest = Manifest.latestVersion(spark, tableDir).getOrElse(
      throw new IllegalStateException(s"manifest table at $tableDir vanished"))
    val floor = Option(start).map(ver).orElse(afterVersion)
    floor match {
      case None => LongOffset(latest) // initial snapshot, never paced
      case Some(f) =>
        val capV = math.min(latest, f + maxVersionsPerTrigger)
        val end = maxBytesPerTrigger match {
          case None => capV
          case Some(maxB) =>
            // BYTES-based admission on top of the version cap: commits
            // vary by orders of magnitude in size, so count pacing
            // alone lets one backlog trigger swallow a fat commit plus
            // everything behind it. Per-commit added-bytes come from
            // the delta sidecars (driver-side text reads, no job); a
            // sidecar-less commit (exactly the oversized ones the
            // sidecar economics skip) fills its trigger alone. At
            // least one commit always admits — pacing bounds batches,
            // it must never stall the stream.
            evictBelow(f)
            var e = f
            var acc = 0L
            var full = false
            while (!full && e < capV) {
              val next = addedBytesMemoized(e + 1)
              if (e == f || acc + next <= maxB) { e += 1; acc += next }
              else full = true
              if (acc >= maxB) full = true
            }
            e
        }
        if (end > f) LongOffset(end) else null
    }
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Legacy hook, kept only because [[Source]] requires it (the engine
    * routes this source through [[latestOffset]]): unpaced —
    * correct without in-session state, just possibly large first
    * catch-up batch. */
  override def getOffset: Option[OffsetV1] = {
    val latest = Manifest.latestVersion(spark, tableDir).getOrElse(
      throw new IllegalStateException(s"manifest table at $tableDir vanished"))
    Some(LongOffset(latest))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endV = ver(end)
    val raw = start match {
      case Some(s) => rangeChanges(ver(s), endV)
      case None => afterVersion match {
        case Some(a) =>
          if (a == endV) emptyBatch() else rangeChanges(a, endV)
        case None => snapshotAsOf(endV)
      }
    }
    GraftStreamBridge.asStreaming(conform(raw))
  }

  override def commit(end: OffsetV1): Unit =
    Manifest.pin(spark, tableDir, pin, ver(end))

  override def stop(): Unit = () // the pin outlives the run: see retire()

  /** The CDC initial load: the full snapshot at `v` as inserts, labeled
    * with the snapshot version (rows from many commits read as one
    * consistent version — the poll feed's fromV = 0 convention). */
  private def snapshotAsOf(v: Long): DataFrame = {
    val base = Manifest.readVersion(spark, tableDir, v)
    val tagged =
      if (mode == "cdc") base.withColumn(ChangeCol, lit("insert"))
      else base
    tagged.withColumn(VersionCol, lit(v))
  }

  /** Changes over `(fromV, toV]`, one single-version step at a time so
    * `_commit_version` is honest per row. Each step's plan reads only
    * that commit's delta files (append-only fast path in both modes);
    * admission control bounds the union width. */
  private def rangeChanges(fromV: Long, toV: Long): DataFrame = {
    require(fromV < toV, s"bad change range ($fromV, $toV]")
    val retained = Manifest.versions(spark, tableDir)
    require(retained.contains(fromV),
      s"stream anchor v$fromV was vacuumed (retained v${retained.head}.." +
        s"v${retained.last}) — the feed has a gap; retire the stream " +
        "and restart from a fresh snapshot, or widen retention")
    val steps = (fromV until toV).map { v =>
      val stepEnd = v + 1
      val step =
        if (mode == "cdc")
          // every step renders with the BATCH-END face: per-step faces
          // would fail the union below as soon as the range spans a
          // rename/drop commit (the physical rows are identical — the
          // rename is sentinel-only — so one face is always right)
          Manifest.changes(spark, tableDir, v, stepEnd,
            renderAsOf = Some(toV))
            .withColumnRenamed("change", ChangeCol)
        else Manifest.appendedBetween(spark, tableDir, v, stepEnd)
          .getOrElse(throw new IllegalStateException(
            s"commit v$stepEnd of $tableDir rewrote or deleted files — " +
              "append mode cannot represent it; restart the stream " +
              "with option(\"mode\", \"cdc\")"))
      step.withColumn(VersionCol, lit(stepEnd))
    }
    steps.reduce(_ unionByName _)
  }

  private def emptyBatch(): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Pin every batch to the stream's fixed schema: select its columns
    * in order and verify the types still line up. A widened table keeps
    * streaming (extra columns ignored until a restart picks them up); a
    * dropped or retyped column fails loudly HERE — handing
    * `internalCreateDataFrame` rows of the wrong shape would mis-read
    * memory, not raise.
    *
    * A frame MISSING one of the stream's columns needs one distinction:
    * after a restart adopts an upstream evolve, the engine replays the
    * last batch's getBatch over PRE-evolution offsets — those frames
    * legitimately lack the added column and null-fill (exactly what the
    * old files read as under the widened schema). A column missing
    * because it was DROPPED from the table stays a loud failure — the
    * current table schema is the arbiter, one metadata-only read. */
  private def conform(df: DataFrame): DataFrame = {
    val have = df.columns.map(_.toLowerCase).toSet
    val missing = schema.fieldNames.filterNot(n =>
      have.contains(n.toLowerCase))
    val filled =
      if (missing.isEmpty) df
      else {
        val current = Manifest.tableSchema(spark, tableDir).fieldNames
        missing.foreach { n =>
          require(current.exists(_.equalsIgnoreCase(n)),
            s"column '$n' was dropped from the table mid-stream — " +
              "restart the query to adopt the narrowed schema")
        }
        missing.foldLeft(df) { (d, n) =>
          d.withColumn(n, lit(null).cast(schema(n).dataType))
        }
      }
    val ordered = filled.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    // a restart-replayed frame from PRE-WIDEN offsets arrives with the
    // narrower type (time travel reads the old sentinel's ddl) —
    // upcast losslessly to the stream schema, the same adoption
    // contract as the null-fill above; anything else is a genuine
    // re-type and stays a loud failure
    val out = schema.fields.foldLeft(ordered) { (d, want) =>
      val got = d.schema(want.name).dataType
      if (!org.apache.spark.sql.types.DataType
          .equalsIgnoreNullability(want.dataType, got) &&
        Manifest.isWidening(got, want.dataType))
        d.withColumn(want.name, col(want.name).cast(want.dataType))
      else d
    }
    schema.fields.zip(out.schema.fields).foreach { case (want, got) =>
      require(org.apache.spark.sql.types.DataType
          .equalsIgnoreNullability(want.dataType, got.dataType),
        s"column '${want.name}' changed type ${want.dataType.sql} -> " +
          s"${got.dataType.sql} mid-stream — restart the query to adopt " +
          "the evolved schema")
    }
    out
  }
}

/** The manifest sink: one snapshot commit per micro-batch, idempotent
  * under checkpoint replay. The engine publishes the query id as a
  * local property before every addBatch; `(queryId, batchId)` rides
  * the commit as the table's transaction marker, so the crash-replay
  * of an already-committed batch is detected INSIDE the commit's
  * conflict-retry loop and no-ops — exactly-once without any
  * sink-side bookkeeping beyond the marker the table already keeps. */
class ManifestSink(spark: SparkSession, tableDir: String,
                   partitionCol: String, keys: Seq[String],
                   statsCols: Seq[String], mergeSchema: Boolean,
                   cdc: Boolean = false,
                   schemaFrom: Option[String] = None)
    extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val appId = Option(
      spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse(throw new IllegalStateException(
        "graft-manifest sink: no streaming query id on this thread — " +
          "addBatch must run inside a streaming query"))
    // The commit path runs SEVERAL actions over this plan (touched
    // partitions, keyed candidates, the write, DV hits); for an
    // Update-mode stateful aggregation each would re-execute the
    // stateful plan and re-commit state-store versions within one
    // trigger. Persist once — the same guard foreachBatch users are
    // told to apply — and release whatever happens to the commit.
    val batch = GraftStreamBridge.asBatch(data).persist()
    try {
      if (cdc)
        // REPLICATION sink: rows shaped like the cdc SOURCE's output
        // (table columns + _change + _commit_version) apply as one
        // commit per batch — deletes delete, inserts upsert, the commit
        // version orders multi-commit batches. source(cdc) → this = B
        // converges to A with exactly-once end to end. With
        // mergeSchema, an upstream ADD COLUMNS folds into the target
        // (evolve-then-apply, replay-safe) instead of refusing.
        // With replicateSchemaFrom, the SOURCE's rename/drop
        // provenance replays onto the target before the batch applies
        // (Manifest.replaySchemaOps) — replication converges across an
        // upstream RENAME instead of forking it into add+null-fill.
        Manifest.applyChangesIfAbsent(spark, tableDir, batch, keys,
          partitionCol, appId, batchId,
          changeCol = ManifestStream.ChangeCol,
          orderCol = Some(ManifestStream.VersionCol), statsCols = statsCols,
          evolveSchema = mergeSchema, schemaFrom = schemaFrom)
      else if (keys.nonEmpty)
        Manifest.upsertIfAbsent(spark, tableDir, batch, keys, partitionCol,
          appId, batchId, statsCols)
      else
        Manifest.appendIfAbsent(spark, tableDir, batch, partitionCol,
          appId, batchId, statsCols, mergeSchema)
    } finally batch.unpersist()
  }
}
