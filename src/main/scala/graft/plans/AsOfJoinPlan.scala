package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanApi, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native as-of join as a first-class Catalyst operator — the
  * (c)-grade extension path: a custom [[AsOfJoinPlan]] logical node, a
  * planner [[AsOfJoinStrategy]], and the streaming-merge
  * [[AsOfJoinExec]] physical operator, registered through
  * `SparkSessionExtensions` ([[GraftExtensions]]).
  *
  * Why a custom operator when [[graft.ops.AsOf]] already expresses the
  * semantics with union+window: the declarative form pays for
  * generality —
  *  - both inputs are REWRITTEN into a common (key, ts, kind, l-struct,
  *    p-struct) shape, boxing every row into null-padded structs;
  *  - the window must SORT the union and run `last(..., ignoreNulls)`
  *    with a running buffer per partition;
  *  - left columns round-trip through a struct and back.
  * The physical operator keeps each side in its own schema, asks the
  * planner for hash co-partitioning + per-partition sort (the same
  * requirements sort-merge join declares, so AQE/EnsureRequirements
  * plan the exchanges), and then streams BOTH sorted sides through a
  * single forward-only merge with O(1) state: the last-seen payload
  * per key. No row amplification, no union, no struct boxing, no
  * window buffer.
  *
  * Match semantics are identical to [[graft.ops.AsOf.asOfJoin]] (and
  * DuckDB `ASOF LEFT JOIN` with a max-payload tie-break): latest right
  * row with `r.ts <= l.ts` per key; exact-ts rows match; equal
  * (key, ts) right rows resolve to the largest payload tuple (the
  * required right-side ordering puts it last); null keys/timestamps
  * never match.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression,
                        payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] physically, making the same stats-based
  * choice Spark's JoinSelection makes for equi-joins: a right side
  * whose estimated size fits `spark.sql.autoBroadcastJoinThreshold`
  * goes to [[BroadcastAsOfJoinExec]] (fact side never shuffles); a big
  * right side goes to the co-partitioned streaming merge
  * [[AsOfJoinExec]]. A no-op for every other node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, payload) =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val exec =
        if (threshold > 0 && r.stats.sizeInBytes <= threshold)
          BroadcastAsOfJoinExec(lk, rk, lts, rts, payload, planLater(l), planLater(r))
        else
          AsOfJoinExec(lk, rk, lts, rts, payload, planLater(l), planLater(r))
      exec :: Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions` entry point (wired in [[graft.Spark.session]]):
  * the as-of planner strategy plus SQL registration of every graft
  * Catalyst expression, so the engine's functions are first-class in
  * `spark.sql(...)` text, not just the Scala DSL. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import graft.functions.GraftExpressions._

  private def fn(name: String, arity: Int)(
      build: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.GraftExpressions", name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == arity, s"$name expects $arity arguments")
        build(exprs)
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // SQL DML + maintenance verbs on registered manifest tables
    // (DELETE FROM / UPDATE / MERGE INTO / VACUUM / OPTIMIZE) — see
    // graft.sql.GraftSqlDml; all other statements pass through the
    // delegate untouched
    ext.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
    ext.injectFunction(fn("rolling_hash64", 1)(e => RollingHash64(e.head)))
    ext.injectFunction(fn("simhash64", 1)(e => SimHash64(e.head)))
    ext.injectFunction(fn("byte_histogram", 1)(e => ByteHistogram(e.head)))
    ext.injectFunction(fn("dot_product", 2)(e => DotProduct(e(0), e(1))))
    ext.injectFunction(fn("cosine_sim", 2)(e => CosineSimilarity(e(0), e(1))))
    ext.injectFunction(fn("sig_agreement", 2)(e => SigAgreement(e(0), e(1))))
    ext.injectFunction(fn("zorder2", 2)(e => ZOrder2(e(0), e(1))))
    // int-literal arities resolved at bind time
    ext.injectFunction(fn("minhash_signature", 2)(e =>
      MinHashSignature(e.head, intLit(e(1), "minhash_signature"))))
    ext.injectFunction(fn("explode_shingles", 2)(e =>
      ExplodeShingles(e.head, intLit(e(1), "explode_shingles"))))
  }

  private def intLit(e: Expression, where: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => sys.error(s"$where expects an integer literal, got $other")
  }
}

object AsOfJoinPlan {

  /** DataFrame-level builder: resolves the key/ts/payload names against
    * the analyzed child plans and wraps the logical node. Payload names
    * must not collide with left's columns (same contract as
    * [[graft.ops.AsOf.asOfJoin]]). */
  def asOfJoinNative(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTs: String, rightTs: String,
                     payload: Seq[String]): DataFrame = {
    val spark: SparkSession = left.sparkSession
    // normalize the right timestamp to TimestampType up front (dates /
    // date-strings compare as timestamps, matching ops.AsOf)
    val l = left.withColumn("__ts", col(leftTs).cast("timestamp"))
    val r = right.withColumn("__ts", col(rightTs).cast("timestamp"))
    val lPlan = l.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"column $name not found in ${plan.output.map(_.name)}"))
    val node = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, "__ts"), attr(rPlan, "__ts"),
      payload.map(attr(rPlan, _)))
    GraftPlanApi.ofRows(spark, node)
      .select(left.columns.map(col).toIndexedSeq ++ payload.map(col): _*)
  }
}
