package graft.io

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.ops.Manifest
import graft.plans.ManifestScan

/** BATCH half of the `graft-manifest` DataSource (the streaming halves
  * live in [[ManifestStream]]): `spark.read.format("graft-manifest")`
  * and `df.write.format("graft-manifest")` over [[graft.ops.Manifest]]
  * tables, so the table format is usable from Spark's standard batch
  * API — including `CREATE TABLE ... USING graft-manifest` SQL — with
  * no library import on the query side.
  *
  * Read options:
  *  - `versionAsOf` — time travel to a committed version (long);
  *  - `timestampAsOf` — time travel to the newest version committed at
  *    or before the given time: epoch millis, ISO-8601 instant, or
  *    `yyyy-MM-dd[ HH:mm:ss]` interpreted in the SESSION timezone.
  *    Mutually exclusive with `versionAsOf`. A time before the
  *    earliest retained commit refuses loudly (vacuum already dropped
  *    that history); a time at or past the newest commit reads the tip.
  *  - `partitionCol` — enables exact partition-value-set pruning on
  *    that column (stats-range pruning applies regardless), same
  *    contract as [[graft.plans.ManifestScan.scan]].
  *
  * The returned relation IS [[ManifestScan]]'s pruning-FileIndex-backed
  * `HadoopFsRelation` whenever the snapshot carries no live deletion
  * vectors — Catalyst plans it like any parquet table (manifest-stats
  * file skipping, `PushedFilters`, whole-stage codegen). Live DVs
  * switch to [[MaskedManifestRelation]], which nests the masked scan
  * (pruning still happens inside) behind a row-based boundary — the
  * price of merge-on-read through the V1 relation API; compaction
  * ([[Manifest.compact]]) folds DVs in and restores the fast shape.
  *
  * Write options: `partitionCol` (or a single-column `.partitionBy`) is
  * REQUIRED — the manifest clusters files by it and records per-file
  * value sets, and it must match the column the table was created with
  * (the same contract every [[Manifest]] write API carries).
  * `statsCols` / `bloomCols` configure pruning at CREATE only (a
  * mid-life reconfiguration would silently fork the table's pruning
  * contract — refused against an existing table, mirroring
  * [[graft.ops.StagedWrite]]). `mergeSchema` permits widening appends.
  * SaveModes: ErrorIfExists creates, Append appends (creating if
  * absent), Overwrite replaces the whole snapshot atomically (old
  * versions stay time-travelable until vacuum), Ignore no-ops when the
  * table exists. */
object ManifestRelation {
  import ManifestStream.optCI

  private[io] def resolveVersion(spark: SparkSession, dir: String,
                                 parameters: Map[String, String]): Option[Long] = {
    val v = optCI(parameters, "versionAsOf").map(_.trim.toLong)
    val ts = optCI(parameters, "timestampAsOf")
    require(v.isEmpty || ts.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    v.orElse(ts.map(t => versionAt(spark, dir, parseTsMillis(spark, t), t)))
  }

  /** [[versionAt]] from the raw timestamp spelling — shared with the
    * streaming source's `afterTimestamp` anchor and
    * [[graft.ops.Manifest.readTimestamp]]. */
  private[graft] def versionAtTime(spark: SparkSession, dir: String,
                                   raw: String): Long =
    versionAt(spark, dir, parseTsMillis(spark, raw), raw)

  /** Newest version whose (monotonically adjusted) commit time is at or
    * before `millis` — [[Manifest.versionTimes]] supplies the series. */
  private def versionAt(spark: SparkSession, dir: String, millis: Long,
                        raw: String): Long = {
    val times = Manifest.versionTimes(spark, dir)
    require(times.nonEmpty, s"no table at $dir")
    times.takeWhile(_._2 <= millis).lastOption match {
      case Some((ver, _)) => ver
      case None =>
        val (v0, t0) = times.head
        throw new IllegalArgumentException(
          s"timestampAsOf '$raw' predates the earliest retained commit " +
            s"of $dir (v$v0 at ${java.time.Instant.ofEpochMilli(t0)}) — " +
            "that history is already vacuumed")
    }
  }

  /** Epoch millis from the accepted timestamp spellings; wall-clock
    * forms bind to the SESSION timezone (the same zone the engine's
    * own timestamp rendering uses), never the JVM default. Exposed to
    * the streaming source's load-time validation (spelling only — the
    * O(retained versions) pointer sweep runs once, at source
    * construction, not again per validation). */
  private[io] def parseTsMillis(spark: SparkSession, s: String): Long = {
    val t = s.trim
    if (t.matches("\\d+")) t.toLong
    else {
      val zone = java.time.ZoneId.of(
        spark.sessionState.conf.sessionLocalTimeZone)
      try java.time.Instant.parse(t).toEpochMilli
      catch {
        case _: java.time.format.DateTimeParseException =>
          val ldt =
            try java.time.LocalDateTime.parse(t.replace(' ', 'T'))
            catch {
              case _: java.time.format.DateTimeParseException =>
                try java.time.LocalDate.parse(t).atStartOfDay()
                catch {
                  case _: java.time.format.DateTimeParseException =>
                    throw new IllegalArgumentException(
                      s"cannot parse timestampAsOf '$s': use epoch millis, " +
                        "an ISO-8601 instant, or yyyy-MM-dd[ HH:mm:ss]")
                }
            }
          ldt.atZone(zone).toInstant.toEpochMilli
      }
    }
  }

  private[io] def forRead(spark: SparkSession, dir: String,
                          partitionCol: Option[String],
                          version: Option[Long]): BaseRelation = {
    val (relation, dvDirs, colMap) = ManifestScan.planned(spark, dir,
      partitionCol, version)
    // a converted-Hive table needs the path-derived partition-column
    // projection on top of the bare file relation (Manifest
    // .hiveInjected), so it routes through the masked wrapper like a
    // DV'd or column-mapped snapshot
    val hive = graft.ops.Manifest
      .extHive(spark, new org.apache.hadoop.fs.Path(dir)).isDefined
    if (dvDirs.isEmpty && colMap.isEmpty && !hive) relation
    // live DVs (mask join) or a column map (logical-face projection):
    // both need a plan ON TOP of the bare file relation, which the V1
    // relation API can only express behind a row boundary
    else new MaskedManifestRelation(spark, dir, partitionCol, version,
      Manifest.logicalStruct(relation.dataSchema, colMap),
      relation.sizeInBytes)
  }

  /** Best-effort V1 `Filter` → `Column` translation for the masked
    * relation: a translated filter lands in the NESTED scan's plan
    * (manifest file skipping + parquet pushdown fire inside), an
    * untranslatable one is simply skipped. SOUNDNESS RULE: the injected
    * filter must be IMPLIED BY the original (it may keep extra rows —
    * the V1 re-apply above `buildScan` removes them — but must never
    * drop one the original keeps). In positive polarity widening is
    * therefore fine: an AND may drop untranslatable conjuncts, an OR
    * may widen its children but needs BOTH (dropping a disjunct would
    * narrow). Under NOT the direction FLIPS — negating a widened child
    * narrows — so a negated subtree must translate EXACTLY. */
  private[io] def toColumn(f: Filter): Option[Column] = f match {
    case And(l, r) =>
      (toColumn(l), toColumn(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (one, other) => one.orElse(other) // a one-sided AND still prunes
      }
    case Or(l, r) => // both required; each may be a widened translation
      for (a <- toColumn(l); b <- toColumn(r)) yield a || b
    case other => exact(other)
  }

  /** The EXACT-only translation: `None` unless the produced Column is
    * equivalent to the filter (no one-sided narrowing anywhere in the
    * subtree). */
  private def exact(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case EqualNullSafe(a, v) => Some(col(a) <=> v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isInCollection(vs.toSeq))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case Not(c) => exact(c).map(!_)
    case And(l, r) => for (a <- exact(l); b <- exact(r)) yield a && b
    case Or(l, r) => for (a <- exact(l); b <- exact(r)) yield a || b
    case _ => None
  }
}

/** Fallback relation for snapshots that need a plan on top of the bare
  * file scan — live deletion vectors (mask anti-join) and/or a column
  * map (logical-face projection): [[buildScan]] rebuilds the full
  * [[ManifestScan.scan]] DataFrame (already masked and logical),
  * re-injects the translatable pushed filters (so manifest file
  * skipping and parquet row-group pushdown still fire inside the
  * nested plan — a logical-name filter pushes through the aliasing
  * projection untouched), prunes to the required columns, and crosses
  * the row boundary once. Spark re-evaluates all filters above this
  * scan (default `unhandledFilters`), so partial translation cannot
  * change answers. */
class MaskedManifestRelation(spark: SparkSession, dir: String,
                             partitionCol: Option[String],
                             version: Option[Long],
                             override val schema: StructType,
                             scanBytes: Long)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = spark.sqlContext

  /** The snapshot's own byte count, NOT the V1 default (which is
    * effectively infinite and would bar a small mapped/DV table from
    * ever broadcast-joining). DV masking only removes rows, so this is
    * a sound over-estimate for the broadcast threshold. */
  override def sizeInBytes: Long = scanBytes

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val base: DataFrame = ManifestScan.scan(spark, dir, partitionCol, version)
    val filtered = filters.iterator.flatMap(ManifestRelation.toColumn)
      .foldLeft(base)(_ where _)
    // empty projection (e.g. COUNT(*)) still needs one Row per row
    filtered.select(requiredColumns.toIndexedSeq.map(col): _*).rdd
  }
}
