package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DateType, LongType, StringType, StructType}

import graft.ops.{Manifest, MergeClause}
import graft.plans.ManifestScan

/** SQL STATEMENT surface for the manifest lake layer: `DELETE FROM` /
  * `UPDATE` / `MERGE INTO` on a registered manifest table route to the
  * three-tier predicate planner and the clause-merge operator, and the
  * maintenance verbs Spark's grammar lacks (`VACUUM t [RETAIN n
  * VERSIONS] [FORCE]`, `OPTIMIZE t [WHERE p IN (...)] [ZORDER BY
  * (x, y[, z]) | HILBERT BY (x, y)]`) parse here directly — Delta's
  * statement set, served by [[GraftSqlParser]] through
  * `spark.sql.extensions` with zero new grammar for the DML verbs
  * (Spark's own parser produces `DeleteFromTable` / `UpdateTable` /
  * `MergeIntoTable`; this layer only REROUTES those plans when the
  * target is a registered manifest table, so every other table's DML
  * behaves exactly as stock Spark).
  *
  * Registration is [[ManifestScan.register]]: the same call that
  * publishes the SELECT temp view records the name → (dir,
  * partitionCol) mapping DML needs. After every successful statement
  * the temp view re-registers at the new latest snapshot, so a
  * follow-up SELECT sees the write (the frozen-at-registration
  * snapshot-isolation contract still holds between writes). */
object GraftSqlTables {
  case class Ref(dir: String, partitionCol: Option[String]) {
    def pCol(name: String): String = partitionCol.getOrElse(
      throw new IllegalArgumentException(
        s"manifest table $name was registered without a partition " +
          "column — ManifestScan.register(name, dir, Some(partitionCol)) " +
          "to enable SQL DML"))
  }

  /** name(lowercased) → table ref. JVM-global like the session's temp
    * views are session-global in this single-session engine; names are
    * case-insensitive, as SQL identifiers are. */
  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, Ref]()

  def put(name: String, dir: String, partitionCol: Option[String]): Unit =
    reg.put(name.toLowerCase(java.util.Locale.ROOT),
      Ref(dir, partitionCol))

  def lookup(name: String): Option[Ref] =
    Option(reg.get(name.toLowerCase(java.util.Locale.ROOT)))

  def drop(name: String): Unit =
    reg.remove(name.toLowerCase(java.util.Locale.ROOT))

  /** Re-publish `name`'s temp view at the table's LATEST snapshot —
    * every DML command's last step, so SQL readers see the write. */
  def refresh(spark: SparkSession, name: String): Unit =
    lookup(name).foreach(r =>
      ManifestScan.register(spark, name, r.dir, r.partitionCol))
}

/** `DELETE FROM <manifest table> [WHERE p]` → the three-tier predicate
  * planner ([[Manifest.deleteWhere]]; merge-on-read via
  * `SET graft.sql.dml.mor=true` → [[Manifest.deleteWhereMor]]). */
case class GraftDeleteCommand(name: String, dir: String, pCol: String,
                              predicate: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlDml.metricOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val m =
      if (GraftSqlDml.morEnabled(spark))
        Manifest.deleteWhereMor(spark, dir, predicate, pCol)
      else Manifest.deleteWhere(spark, dir, predicate, pCol)
    GraftSqlTables.refresh(spark, name)
    GraftSqlDml.metricRows(m)
  }
}

/** `UPDATE <manifest table> SET c = e, ... [WHERE p]` →
  * [[Manifest.updateWhere]] / (MoR) [[Manifest.updateWhereMor]]. */
case class GraftUpdateCommand(name: String, dir: String, pCol: String,
                              set: Seq[(String, String)], predicate: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlDml.metricOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val m =
      if (GraftSqlDml.morEnabled(spark))
        Manifest.updateWhereMor(spark, dir, set, predicate, pCol)
      else Manifest.updateWhere(spark, dir, set, predicate, pCol)
    GraftSqlTables.refresh(spark, name)
    GraftSqlDml.metricRows(m)
  }
}

/** `MERGE INTO <manifest table> [AS t] USING <src> [AS s] ON ... WHEN
  * ...` → [[Manifest.mergeClauses]]. `sourcePlan` is the parsed (still
  * unresolved) source subtree; it resolves through the session's own
  * analyzer at run time, so views, subqueries, and other registered
  * manifest tables all work as sources. */
case class GraftMergeCommand(name: String, dir: String, pCol: String,
                             sourcePlan: LogicalPlan,
                             on: Seq[(String, String)],
                             targetAlias: String, sourceAlias: String,
                             matched: Seq[MergeClause.Matched],
                             notMatched: Seq[MergeClause.NotMatched],
                             notMatchedBySource: Seq[MergeClause.NotMatchedBySource])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlDml.metricOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val source =
      org.apache.spark.sql.GraftPlanApi.ofRows(spark, sourcePlan)
    val m = Manifest.mergeClauses(spark, dir, source, on, pCol,
      matched, notMatched, notMatchedBySource, targetAlias, sourceAlias)
    GraftSqlTables.refresh(spark, name)
    GraftSqlDml.metricRows(m)
  }
}

/** `VACUUM <manifest table> [RETAIN n VERSIONS] [FORCE]` →
  * [[Manifest.vacuumOrphans]] (age floor from
  * `graft.vacuum.staleMillis`, default 1 h — set 0 only in
  * single-writer maintenance windows). */
case class GraftVacuumCommand(name: String, dir: String,
                              keepVersions: Int, force: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlDml.metricOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val stale = spark.conf.getOption("graft.vacuum.staleMillis")
      .map(_.toLong).getOrElse(3600 * 1000L)
    val n = Manifest.vacuumOrphans(spark, dir, keepVersions, stale, force)
    // the registered view may be frozen at a version this vacuum just
    // dropped — re-register at the surviving latest so the next SELECT
    // never opens a reclaimed file
    GraftSqlTables.refresh(spark, name)
    GraftSqlDml.metricRows(Map("files_reclaimed" -> n))
  }
}

/** `OPTIMIZE <manifest table> [INCREMENTAL] [WHERE pcol IN (...)]
  * [ZORDER BY (x, y[, z]) | HILBERT BY (x, y)]` → [[Manifest.compact]]
  * / `clusterZ[3][Where]` / `clusterHilbert[Where]` /
  * [[Manifest.clusterIncremental]]. */
case class GraftOptimizeCommand(name: String, dir: String, pCol: String,
                                values: Seq[String], curve: Option[String],
                                curveCols: Seq[String],
                                incremental: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlDml.metricOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val n: Long = (curve, curveCols, values) match {
      case _ if incremental =>
        require(values.isEmpty,
          "OPTIMIZE INCREMENTAL takes no WHERE — it scopes itself to " +
            "the files added since the last pass")
        (curve, curveCols) match {
          case (Some("ZORDER"), Seq(x, y)) =>
            Manifest.clusterIncremental(spark, dir, pCol, x, y)
          case (Some("HILBERT"), Seq(x, y)) =>
            Manifest.clusterIncremental(spark, dir, pCol, x, y,
              hilbert = true)
          case _ => throw new IllegalArgumentException(
            "OPTIMIZE INCREMENTAL needs ZORDER BY (x, y) or " +
              "HILBERT BY (x, y)")
        }
      case (None, _, vs) =>
        Manifest.compact(spark, dir, pCol, values = vs)
      case (Some("ZORDER"), Seq(x, y), Nil) =>
        Manifest.clusterZ(spark, dir, pCol, x, y); -1L
      case (Some("ZORDER"), Seq(x, y, z), Nil) =>
        Manifest.clusterZ3(spark, dir, pCol, x, y, z); -1L
      case (Some("HILBERT"), Seq(x, y), Nil) =>
        Manifest.clusterHilbert(spark, dir, pCol, x, y); -1L
      case (Some("ZORDER"), Seq(x, y), vs) =>
        Manifest.clusterZWhere(spark, dir, pCol, x, y, vs)
      case (Some("ZORDER"), Seq(x, y, z), vs) =>
        Manifest.clusterZ3Where(spark, dir, pCol, x, y, z, vs)
      case (Some("HILBERT"), Seq(x, y), vs) =>
        Manifest.clusterHilbertWhere(spark, dir, pCol, x, y, vs)
      case (Some(c), cols, _) => throw new IllegalArgumentException(
        s"OPTIMIZE $c BY takes 2 (or, for ZORDER, 3) columns; " +
          s"got ${cols.size}")
    }
    GraftSqlTables.refresh(spark, name)
    GraftSqlDml.metricRows(Map("files_touched" -> n))
  }
}

/** `DESCRIBE HISTORY <manifest table>` → [[Manifest.describeHistory]]
  * (per-version snapshot shape; O(retained versions), no entry
  * collect). */
case class GraftDescribeHistoryCommand(name: String, dir: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files", LongType, nullable = false)(),
    AttributeReference("rows", LongType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)(),
    AttributeReference("dv_dirs", LongType, nullable = false)(),
    AttributeReference("constraints", LongType, nullable = false)(),
    AttributeReference("txn", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val df = Manifest.describeHistory(spark, dir)
    require(df.columns.toSeq == output.map(_.name),
      s"describeHistory schema drifted: ${df.columns.mkString(",")}")
    df.collect().toSeq
  }
}

/** `RESTORE <manifest table> [TO] VERSION AS OF <n>` →
  * [[Manifest.restore]] (a new commit re-pointing at version n's
  * manifest; history is append-only, nothing is erased). */
case class GraftRestoreCommand(name: String, dir: String, version: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlDml.metricOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val v = Manifest.restore(spark, dir, version)
    GraftSqlTables.refresh(spark, name)
    GraftSqlDml.metricRows(Map("restored_as_version" -> v))
  }
}

/** `CLONE <manifest table> TO '<dir>' [AS <name>]` →
  * [[Manifest.shallowClone]]; with AS the clone registers for SQL
  * under the new name (source's partition column carries). */
case class GraftCloneCommand(srcName: String, srcDir: String,
                             pCol: Option[String], dstDir: String,
                             asName: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftSqlDml.metricOutput
  override def run(spark: SparkSession): Seq[Row] = {
    val n = Manifest.shallowClone(spark, srcDir, dstDir)
    asName.foreach(a => ManifestScan.register(spark, a, dstDir, pCol))
    GraftSqlDml.metricRows(Map("batch_dirs_referenced" -> n))
  }
}

object GraftSqlDml {
  private[sql] def metricOutput: Seq[Attribute] = Seq(
    AttributeReference("metric", StringType, nullable = false)(),
    AttributeReference("value", LongType, nullable = false)())

  private[sql] def metricRows(m: Map[String, Long]): Seq[Row] =
    m.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }

  private[sql] def morEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption("graft.sql.dml.mor").exists(_.toBoolean)

  // ---- extension statements Spark's grammar lacks ----

  private val VacuumRe =
    """(?is)^\s*VACUUM\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?(\s+FORCE)?\s*;?\s*$""".r
  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+([A-Za-z_][A-Za-z0-9_]*)(\s+INCREMENTAL)?(?:\s+WHERE\s+(.*?))?(?:\s+(ZORDER|HILBERT)\s+BY\s*\(\s*([^)]*?)\s*\))?\s*;?\s*$""".r
  private val DescribeHistoryRe =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val RestoreRe =
    """(?is)^\s*RESTORE\s+([A-Za-z_][A-Za-z0-9_]*)\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r
  private val CloneRe =
    """(?is)^\s*CLONE\s+([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+'([^']+)'(?:\s+AS\s+([A-Za-z_][A-Za-z0-9_]*))?\s*;?\s*$""".r

  /** Parse a graft extension statement, or None for everything else
    * (the delegate parser then sees the text untouched). A matched
    * verb over an UNREGISTERED name is a loud error, not a fallthrough
    * — the delegate could only produce a worse message. */
  def parseExtension(sqlText: String,
                     delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case VacuumRe(name, retain, force) =>
        val ref = lookupOrThrow(name, "VACUUM")
        Some(GraftVacuumCommand(name, ref.dir,
          Option(retain).map(_.toInt).getOrElse(1), force != null))
      case OptimizeRe(name, incr, where, curve, cols) =>
        val ref = lookupOrThrow(name, "OPTIMIZE")
        val pCol = ref.pCol(name)
        val values = Option(where).map(w =>
          partitionValues(delegate.parseExpression(w), pCol))
          .getOrElse(Nil)
        val curveCols = Option(cols).map(_.split(',')
          .map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).toSeq).getOrElse(Nil)
        Some(GraftOptimizeCommand(name, ref.dir, pCol, values,
          Option(curve).map(_.toUpperCase(java.util.Locale.ROOT)),
          curveCols, incremental = incr != null))
      case DescribeHistoryRe(name) =>
        val ref = lookupOrThrow(name, "DESCRIBE HISTORY")
        Some(GraftDescribeHistoryCommand(name, ref.dir))
      case RestoreRe(name, v) =>
        val ref = lookupOrThrow(name, "RESTORE")
        Some(GraftRestoreCommand(name, ref.dir, v.toLong))
      case CloneRe(name, dstDir, asName) =>
        val ref = lookupOrThrow(name, "CLONE")
        Some(GraftCloneCommand(name, ref.dir, ref.partitionCol, dstDir,
          Option(asName)))
      case _ => None
    }

  private def lookupOrThrow(name: String, verb: String): GraftSqlTables.Ref =
    GraftSqlTables.lookup(name).getOrElse(
      throw new IllegalArgumentException(
        s"$verb targets $name, which is not a registered manifest " +
          "table (ManifestScan.register it first)"))

  /** `OPTIMIZE ... WHERE` accepts exactly the scope the scoped
    * operators take: `pcol = v` or `pcol IN (v, ...)` over literals —
    * rendered to the partition value-set's string form. */
  private def partitionValues(e: Expression, pCol: String): Seq[String] = {
    def attrOk(a: Expression): Boolean = a match {
      case u: UnresolvedAttribute =>
        u.nameParts.last.equalsIgnoreCase(pCol)
      case _ => false
    }
    def render(l: Expression): String = l match {
      case Literal(v, DateType) =>
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
      case Literal(v, _) => String.valueOf(v)
      case Cast(inner, _, _, _) => render(inner)
      case other => throw new IllegalArgumentException(
        s"OPTIMIZE WHERE values must be literals; got ${other.sql}")
    }
    e match {
      case EqualTo(a, l) if attrOk(a) => Seq(render(l))
      case EqualTo(l, a) if attrOk(a) => Seq(render(l))
      case In(a, ls) if attrOk(a) => ls.map(render)
      case other => throw new IllegalArgumentException(
        s"OPTIMIZE WHERE must scope the partition column ($pCol = v or " +
          s"$pCol IN (...)); got ${other.sql}")
    }
  }

  // ---- rerouting Spark-parsed DML plans ----

  /** The registered manifest table a DML target names, if any: unwraps
    * one optional alias, requires a single-part name. */
  private def targetOf(plan: LogicalPlan)
      : Option[(String, String, GraftSqlTables.Ref)] = plan match {
    case SubqueryAlias(ident, child) =>
      targetOf(child).map { case (n, _, r) => (n, ident.name, r) }
    case r: UnresolvedRelation if r.multipartIdentifier.size == 1 =>
      val n = r.multipartIdentifier.head
      GraftSqlTables.lookup(n).map(ref => (n, n, ref))
    case _ => None
  }

  /** Strip a leading qualifier in `quals` off every attribute — DELETE
    * and UPDATE predicates run against the bare scan frame, where
    * `tbl.col` would not resolve. */
  private def unqualify(e: Expression, quals: Set[String]): Expression =
    e.transform {
      case u: UnresolvedAttribute if u.nameParts.size > 1 &&
          quals.contains(u.nameParts.head.toLowerCase(java.util.Locale.ROOT)) =>
        UnresolvedAttribute(u.nameParts.tail)
    }

  /** DML predicates re-render to text and re-parse inside the
    * operators, which evaluate them per row against the table alone —
    * a subquery (`WHERE k IN (SELECT ...)`) cannot survive that trip;
    * refuse with the remedy instead of a downstream parse error. */
  private def refuseSubqueries(e: Expression, where: String): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      throw new IllegalArgumentException(
        s"subqueries are not supported in $where on manifest tables — " +
          "materialize the subquery (e.g. a temp view joined via MERGE " +
          "INTO, or Manifest.delete with a keys DataFrame) instead")

  /** Reroute a Spark-parsed DML plan whose target is a registered
    * manifest table; every other plan passes through untouched. */
  def reroute(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable =>
      targetOf(d.table).map { case (name, alias, ref) =>
        refuseSubqueries(d.condition, "DELETE conditions")
        val quals = Set(name.toLowerCase(java.util.Locale.ROOT),
          alias.toLowerCase(java.util.Locale.ROOT))
        GraftDeleteCommand(name, ref.dir, ref.pCol(name),
          unqualify(d.condition, quals).sql): LogicalPlan
      }.getOrElse(plan)
    case u: UpdateTable =>
      targetOf(u.table).map { case (name, alias, ref) =>
        u.condition.foreach(refuseSubqueries(_, "UPDATE conditions"))
        u.assignments.foreach(a =>
          refuseSubqueries(a.value, "UPDATE SET expressions"))
        val quals = Set(name.toLowerCase(java.util.Locale.ROOT),
          alias.toLowerCase(java.util.Locale.ROOT))
        val set = u.assignments.map { a =>
          val k = a.key match {
            case ua: UnresolvedAttribute => ua.nameParts.last
            case other => throw new IllegalArgumentException(
              s"UPDATE SET key must be a column; got ${other.sql}")
          }
          k -> unqualify(a.value, quals).sql
        }
        val cond = u.condition.map(c => unqualify(c, quals).sql)
          .getOrElse("true")
        GraftUpdateCommand(name, ref.dir, ref.pCol(name), set,
          cond): LogicalPlan
      }.getOrElse(plan)
    case m: MergeIntoTable =>
      targetOf(m.targetTable).map { case (name, tAlias, ref) =>
        rerouteMerge(m, name, tAlias, ref): LogicalPlan
      }.getOrElse(plan)
    case _ => plan
  }

  private def rerouteMerge(m: MergeIntoTable, name: String,
                           tAlias: String,
                           ref: GraftSqlTables.Ref): GraftMergeCommand = {
    require(!m.withSchemaEvolution,
      "MERGE ... WITH SCHEMA EVOLUTION is not supported on manifest " +
        "tables — evolve() the target first")
    val (sAlias, srcPlan) = m.sourceTable match {
      case SubqueryAlias(ident, child) => (ident.name, child)
      case r: UnresolvedRelation if r.multipartIdentifier.size == 1 =>
        (r.multipartIdentifier.head, r)
      case other => throw new IllegalArgumentException(
        "MERGE USING a subquery needs an alias (USING (...) AS s); " +
          s"got ${other.nodeName}")
    }
    // ON must be a conjunction of t.col = s.col equalities — the shape
    // the keyed candidate pruning can plan. (General ON predicates
    // would force a full-scan theta join; refuse loudly instead.)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def sideOf(a: UnresolvedAttribute): Option[(String, String)] =
      if (a.nameParts.size == 2) Some((a.nameParts.head, a.nameParts.last))
      else None
    val on = conjuncts(m.mergeCondition).map {
      case EqualTo(x: UnresolvedAttribute, y: UnresolvedAttribute) =>
        (sideOf(x), sideOf(y)) match {
          case (Some((qx, cx)), Some((qy, cy)))
              if qx.equalsIgnoreCase(tAlias) && qy.equalsIgnoreCase(sAlias) =>
            cx -> cy
          case (Some((qx, cx)), Some((qy, cy)))
              if qx.equalsIgnoreCase(sAlias) && qy.equalsIgnoreCase(tAlias) =>
            cy -> cx
          case _ => throw new IllegalArgumentException(
            s"MERGE ON term must pair the target and source aliases " +
              s"($tAlias/$sAlias); got ${EqualTo(x, y).sql}")
        }
      case other => throw new IllegalArgumentException(
        "MERGE ON must be a conjunction of target.col = source.col " +
          s"equalities; got ${other.sql}")
    }
    def setOf(assigns: Seq[Assignment]): Seq[(String, String)] =
      assigns.map { a =>
        val k = a.key match {
          case ua: UnresolvedAttribute => ua.nameParts.last
          case other => throw new IllegalArgumentException(
            s"SET key must be a column; got ${other.sql}")
        }
        refuseSubqueries(a.value, "MERGE SET/VALUES expressions")
        k -> a.value.sql
      }
    (m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions)
      .foreach {
        case UpdateAction(c, _, _) =>
          c.foreach(refuseSubqueries(_, "MERGE clause conditions"))
        case DeleteAction(c) =>
          c.foreach(refuseSubqueries(_, "MERGE clause conditions"))
        case InsertAction(c, _) =>
          c.foreach(refuseSubqueries(_, "MERGE clause conditions"))
        case _ => ()
      }
    val matched = m.matchedActions.map {
      case UpdateAction(c, assigns, _) =>
        MergeClause.Matched(MergeClause.Update(setOf(assigns)), c.map(_.sql))
      case UpdateStarAction(c) =>
        MergeClause.Matched(MergeClause.Update(Nil), c.map(_.sql))
      case DeleteAction(c) =>
        MergeClause.Matched(MergeClause.Delete, c.map(_.sql))
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN MATCHED action: $other")
    }
    val notMatched = m.notMatchedActions.map {
      case InsertAction(c, assigns) =>
        MergeClause.NotMatched(setOf(assigns), c.map(_.sql))
      case InsertStarAction(c) =>
        MergeClause.NotMatched(Nil, c.map(_.sql))
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN NOT MATCHED action: $other")
    }
    val nmbs = m.notMatchedBySourceActions.map {
      case UpdateAction(c, assigns, _) =>
        MergeClause.NotMatchedBySource(MergeClause.Update(setOf(assigns)),
          c.map(_.sql))
      case DeleteAction(c) =>
        MergeClause.NotMatchedBySource(MergeClause.Delete, c.map(_.sql))
      case other => throw new IllegalArgumentException(
        s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
    }
    GraftMergeCommand(name, ref.dir, ref.pCol(name), srcPlan, on,
      tAlias, sAlias, matched, notMatched, nmbs)
  }
}

/** The `spark.sql.extensions`-injected parser: graft's maintenance
  * verbs first, then the delegate's full grammar with DML plans over
  * registered manifest tables rerouted ([[GraftSqlDml.reroute]]).
  * Everything else — including DML on non-manifest tables — is the
  * delegate's output verbatim. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlDml.parseExtension(sqlText, delegate)
      .getOrElse(GraftSqlDml.reroute(delegate.parsePlan(sqlText)))

  // the parameterized-sql entry point (spark.sql(text, args)): the
  // interface DEFAULT ignores the parameters, so it MUST forward to
  // the delegate's own implementation or every parameterized query on
  // this session would silently lose its arguments. Extension verbs
  // (regex-parsed, parameter-free) still intercept; a PARAMETERIZED
  // DML statement arrives wrapped in the parameter node, does not
  // match the reroute, and keeps stock Spark's behavior — our commands
  // re-parse predicate TEXT, so substituting markers is not ours to do
  override def parsePlanWithParameters(
      sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan =
    GraftSqlDml.parseExtension(sqlText, delegate)
      .getOrElse(GraftSqlDml.reroute(
        delegate.parsePlanWithParameters(sqlText, ctx)))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}
