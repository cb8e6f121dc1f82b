package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

import graft.ops.{Manifest, ManifestEntry}

/** Catalyst-integrated DATA SKIPPING for [[graft.ops.Manifest]] tables.
  *
  * [[Manifest.readRange]] / [[Manifest.readPoint]] prune files only when
  * the caller routes the predicate through those explicit APIs. This
  * [[FileIndex]] moves the pruning INTO THE PLANNER: the snapshot's file
  * list and per-file stats become the listing Spark's own
  * `FileSourceStrategy` consults, so ANY `WHERE` clause over
  * [[ManifestScan.scan]]'s DataFrame — including one Catalyst derived by
  * pushing a join predicate or folding a constant — skips files whose
  * recorded stats cannot match, with zero API cooperation from the
  * query author. Everything downstream is Spark's stock parquet path:
  * whole-stage codegen, parquet row-group pushdown (`PushedFilters`),
  * column pruning (`ReadSchema`), AQE.
  *
  * At 100 TB this is the difference between "the engine CAN skip" and
  * "the engine DOES skip": a 1000-executor query with a date range in
  * its WHERE clause opens `O(matching files)` of an ~8×10⁵-file table
  * during PLANNING, before a single task launches. The same shape as
  * Delta's `TahoeFileIndex` / Iceberg's scan planning.
  *
  * Pruning sources, all sound over-approximations (a kept file may
  * contain no match; a dropped file provably cannot):
  *  - partition-value SETS (exact distinct values per file, unless
  *    `overflow`): equality / IN / range / null-ness on `partitionCol`;
  *  - per-file MIN/MAX for the sentinel's `stat_cols`: range and
  *    equality, compared with the same type-aware rendered ordering as
  *    [[Manifest.readRange]];
  *  - all-null detection: a null min/max slot means the column has no
  *    non-null row in that file, so the `IsNotNull` guard Catalyst
  *    attaches to every null-intolerant predicate prunes it.
  *
  * The index is FROZEN at one snapshot version (snapshot isolation —
  * concurrent commits never shift a running query's file list);
  * `refresh()` is deliberately a no-op. Deletion-vector masking is
  * layered ON TOP by [[ManifestScan.scan]], not here: the index decides
  * which files to open, the mask decides which rows of them survive.
  */
class ManifestFileIndex(spark: SparkSession, dir: String,
                        partitionCol: Option[String] = None,
                        version: Option[Long] = None) extends FileIndex {

  private[graft] val snap = Manifest.loadSnapshot(spark, dir, version)

  val dataSchema: StructType =
    DataType.fromDDL(snap.ddl).asInstanceOf[StructType]

  private val root = new Path(dir)
  private val fs =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val qualifiedRoot = fs.makeQualified(root)

  private def statusOf(e: ManifestEntry): FileStatus =
    new FileStatus(e.bytes, false, 1, 128L << 20, 0L,
      fs.makeQualified(new Path(qualifiedRoot, e.path)))

  /** FileStatus per entry, built ONCE: the index is frozen at one
    * snapshot, and Path/URI construction is the dominant cost of a
    * full listing at ~10⁶ files (measured 5.0 s → amortized across
    * every listFiles call of the query, and of every later query over
    * the same scan DataFrame). */
  private lazy val statuses: Array[FileStatus] =
    snap.entries.map(statusOf).toArray

  override def rootPaths: Seq[Path] = Seq(qualifiedRoot)

  override def partitionSchema: StructType = new StructType()

  override def inputFiles: Array[String] =
    statuses.map(_.getPath.toString)

  override def sizeInBytes: Long = snap.entries.map(_.bytes).sum

  /** Frozen snapshot by design — see class doc. */
  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // COMPILE each predicate once (literal renderings, per-column
    // orderings, stat-slot lookups all hoisted), then run the closures
    // over the entries: at ~10⁶ files the interpreted per-entry walk
    // re-resolved all of that per entry — measured 2.6 s/predicate,
    // ~10× less compiled
    val preds = dataFilters.map(compile)
    val out = Array.newBuilder[FileStatus]
    var i = 0
    val es = snap.entries
    while (i < es.length) {
      val e = es(i)
      if (preds.forall(p => p(e))) out += statuses(i)
      i += 1
    }
    Seq(PartitionDirectory(InternalRow.empty, out.result()))
  }

  /** Files the index would open under `filters` — the spec hook (and a
    * cheap dry-run "EXPLAIN files" for operators sizing a rewrite). */
  private[graft] def candidateCount(filters: Seq[Expression]): Int =
    listFiles(Nil, filters).head.files.size

  // -------- pruning: can file `e` hold a row matching `cond`? --------

  private val timeZone = Some(spark.sessionState.conf.sessionLocalTimeZone)

  /** The literal under the SAME rendering the stats were written with
    * (`Column.cast("string")`; TIMESTAMPS as zone-free epoch micros —
    * their Catalyst literal value IS micros, so no cast and no
    * session-timezone dependence), so writer and planner can never
    * disagree; null literal renders to None. */
  private def rendered(value: Any, dt: DataType): Option[String] =
    dt match {
      case TimestampType => Option(value).map(_.toString)
      case _ =>
        Option(Cast(Literal(value, dt), StringType, timeZone).eval(null))
          .map(_.toString)
    }

  private def statSlot(e: ManifestEntry, name: String): Option[Int] = {
    val i = snap.statsCols.indexWhere(_.equalsIgnoreCase(name))
    // guard against ragged slots (never written by this module, but a
    // wrong-length manifest must fail open, not prune wrongly)
    if (i >= 0 && e.stat_mins.length == snap.statsCols.length &&
      e.stat_maxs.length == snap.statsCols.length) Some(i)
    else None
  }

  private def isPartitionCol(name: String): Boolean =
    partitionCol.exists(_.equalsIgnoreCase(name)) &&
      // value-SET pruning compares session-timezone string renderings,
      // unsound for TimestampType across sessions — such a column falls
      // through to its (zone-free) min/max stats, if configured
      !dataSchema.fields.exists(f =>
        f.name.equalsIgnoreCase(name) && f.dataType == TimestampType)

  private def orderingFor(name: String): Option[(String, String) => Int] =
    dataSchema.fields.find(_.name.equalsIgnoreCase(name))
      .flatMap(f => Manifest.renderedOrdering(f.dataType))

  private type Pred = ManifestEntry => Boolean
  private val KeepAll: Pred = _ => true

  /** Range intersection COMPILED once per predicate: the per-column
    * ordering, partition-col decision, stat-slot index, and bound
    * strings are resolved here, and only the per-entry work (a couple
    * of comparisons) runs inside the entry loop. Checks the exact
    * partition-value set first (no overflow = every distinct value is
    * recorded), then the min/max stat slot. At ~10⁶ entries the
    * per-entry re-resolution this replaces cost 2.6 s per predicate
    * (tools/ManifestPlanBench). */
  private def rangePred(name: String,
                        lo: Option[String], loStrict: Boolean,
                        hi: Option[String], hiStrict: Boolean): Pred = {
    val cmpOpt = orderingFor(name)
    if (cmpOpt.isEmpty) return KeepAll // no safe ordering: never prune
    val cmp = cmpOpt.get
    val isPart = isPartitionCol(name)
    val slot = snap.statsCols.indexWhere(_.equalsIgnoreCase(name))
    val nStats = snap.statsCols.length
    def valueOk(v: String): Boolean =
      lo.forall(l => if (loStrict) cmp(v, l) > 0 else cmp(v, l) >= 0) &&
        hi.forall(h => if (hiStrict) cmp(v, h) < 0 else cmp(v, h) <= 0)
    e => try {
      if (isPart && !e.overflow)
        e.values.exists(valueOk) // exact: range matches no null row
      // ragged-slot guard: a wrong-length manifest fails open
      else if (slot >= 0 && e.stat_mins.length == nStats &&
        e.stat_maxs.length == nStats) {
        val mn = e.stat_mins(slot); val mx = e.stat_maxs(slot)
        if (mn == null || mx == null) false // all-null column
        else
          lo.forall(l => if (loStrict) cmp(mx, l) > 0 else cmp(mx, l) >= 0) &&
            hi.forall(h => if (hiStrict) cmp(mn, h) < 0 else cmp(mn, h) <= 0)
      } else true
    } catch {
      // a stored stat that does not parse in the current rendering
      // (e.g. pre-epoch-micros timestamp manifests hold wall-clock
      // strings) cannot order -- fail open, keep the file
      case _: NumberFormatException => true
    }
  }

  private def eqPred(name: String, value: Any, dt: DataType): Pred =
    rendered(value, dt) match {
      case None => _ => false // `c = NULL` matches nothing
      case Some(v) =>
        val isPart = isPartitionCol(name)
        val range = rangePred(name, Some(v), loStrict = false,
          Some(v), hiStrict = false)
        e => if (isPart && !e.overflow) e.values.contains(v) else range(e)
    }

  private def isNullPred(name: String): Pred =
    if (isPartitionCol(name)) e => e.overflow || e.has_null
    else KeepAll // min/max can't witness absence of nulls

  private def notNullPred(name: String): Pred =
    if (isPartitionCol(name)) e => e.overflow || e.values.nonEmpty
    else {
      val slot = snap.statsCols.indexWhere(_.equalsIgnoreCase(name))
      val nStats = snap.statsCols.length
      e =>
        if (slot >= 0 && e.stat_mins.length == nStats)
          e.stat_mins(slot) != null // null slot = all-null file
        else true
    }

  /** One predicate expression → one entry-level closure; every
    * name/literal/ordering resolution happens here, once. */
  private def compile(cond: Expression): Pred =
    cond match {
      case And(l, r) =>
        val a = compile(l); val b = compile(r); e => a(e) && b(e)
      case Or(l, r) =>
        val a = compile(l); val b = compile(r); e => a(e) || b(e)
      case EqualTo(a: AttributeReference, Literal(v, dt)) =>
        eqPred(a.name, v, dt)
      case EqualTo(Literal(v, dt), a: AttributeReference) =>
        eqPred(a.name, v, dt)
      case EqualNullSafe(a: AttributeReference, Literal(v, dt)) =>
        if (v == null) isNullPred(a.name) else eqPred(a.name, v, dt)
      case EqualNullSafe(Literal(v, dt), a: AttributeReference) =>
        if (v == null) isNullPred(a.name) else eqPred(a.name, v, dt)
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        val ps = vs.map { case Literal(v, dt) => eqPred(a.name, v, dt) }
        e => ps.exists(p => p(e))
      case InSet(a: AttributeReference, vs) =>
        val ps = vs.toSeq.map(v => eqPred(a.name, v, a.dataType))
        e => ps.exists(p => p(e))
      case GreaterThan(a: AttributeReference, Literal(v, dt)) =>
        rendered(v, dt).map(l => rangePred(a.name, Some(l),
          loStrict = true, None, hiStrict = false)).getOrElse(KeepAll)
      case GreaterThan(Literal(v, dt), a: AttributeReference) =>
        rendered(v, dt).map(h => rangePred(a.name, None,
          loStrict = false, Some(h), hiStrict = true)).getOrElse(KeepAll)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
        rendered(v, dt).map(l => rangePred(a.name, Some(l),
          loStrict = false, None, hiStrict = false)).getOrElse(KeepAll)
      case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) =>
        rendered(v, dt).map(h => rangePred(a.name, None,
          loStrict = false, Some(h), hiStrict = false)).getOrElse(KeepAll)
      case LessThan(a: AttributeReference, Literal(v, dt)) =>
        rendered(v, dt).map(h => rangePred(a.name, None,
          loStrict = false, Some(h), hiStrict = true)).getOrElse(KeepAll)
      case LessThan(Literal(v, dt), a: AttributeReference) =>
        rendered(v, dt).map(l => rangePred(a.name, Some(l),
          loStrict = true, None, hiStrict = false)).getOrElse(KeepAll)
      case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
        rendered(v, dt).map(h => rangePred(a.name, None,
          loStrict = false, Some(h), hiStrict = false)).getOrElse(KeepAll)
      case LessThanOrEqual(Literal(v, dt), a: AttributeReference) =>
        rendered(v, dt).map(l => rangePred(a.name, Some(l),
          loStrict = false, None, hiStrict = false)).getOrElse(KeepAll)
      case IsNull(a: AttributeReference) => isNullPred(a.name)
      case IsNotNull(a: AttributeReference) => notNullPred(a.name)
      case StartsWith(a: AttributeReference, Literal(v, StringType))
        if v != null =>
        // exact prefix range under UTF-16 code-UNIT ordering (the
        // String.compareTo the string stats use): p <= s < successor(p)
        // where successor increments p's last code unit below \uFFFF
        // (trailing \uFFFF units drop -- they admit no successor; an
        // all-\uFFFF prefix has no upper bound). Appending U+10FFFF
        // would be WRONG: it encodes as the surrogate pair DBFF DFFF,
        // which sorts BELOW the unpaired code units [E000, FFFF] under
        // compareTo -- a file holding only rows whose char after the
        // prefix lies in that range would be pruned, silently missing
        // rows.
        val p = v.toString
        val succ = {
          val trimmed = p.reverse.dropWhile(_ == '\uFFFF').reverse
          if (trimmed.isEmpty) None
          else Some(trimmed.init + (trimmed.last + 1).toChar)
        }
        rangePred(a.name, Some(p), loStrict = false, succ, hiStrict = true)
      case _ => KeepAll // unknown shape: fail open, never prune
    }

}

object ManifestScan {

  /** A manifest table as a planner-native DataFrame: file listing from
    * the committed snapshot (version `v`, default latest), data
    * skipping from the manifest's stats (see [[ManifestFileIndex]]),
    * scan/codegen from Spark's stock parquet format. `partitionCol`
    * additionally enables exact value-set pruning on that column. */
  def scan(spark: SparkSession, dir: String,
           partitionCol: Option[String] = None,
           version: Option[Long] = None): DataFrame = {
    val index = new ManifestFileIndex(spark, dir, partitionCol, version)
    val relation = HadoopFsRelation(index, new StructType(),
      index.dataSchema, None, new ParquetFileFormat(), Map.empty)(spark)
    val df = spark.baseRelationToDataFrame(relation)
    // merge-on-read: snapshots with live deletion vectors get the
    // row-position anti-join on top; pruning still applies underneath
    if (index.snap.dvDirs.isEmpty) df
    else Manifest.maskedByDv(spark, dir, df, index.snap.dvDirs)
  }

  /** Register the manifest table as a SQL temp view named `name`, so
    * `spark.sql("... FROM name WHERE ...")` plans through the pruning
    * FileIndex like any [[scan]] DataFrame (SQL WHERE clauses become the
    * same pushed dataFilters). Re-registering refreshes to the then-
    * latest snapshot — a view is FROZEN at its registration version,
    * which is snapshot isolation, not staleness. */
  def register(spark: SparkSession, name: String, dir: String,
               partitionCol: Option[String] = None,
               version: Option[Long] = None): Unit =
    scan(spark, dir, partitionCol, version).createOrReplaceTempView(name)
}
