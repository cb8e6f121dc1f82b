package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  Add, AggregateWindowFunction, AttributeReference, Cast, Coalesce,
  Expression, GreaterThan, If, Literal}
import org.apache.spark.sql.types._

/** Next-fit sequence packing as a declarative Catalyst window function.
  *
  * Training pipelines pack variable-length documents into fixed
  * token-budget sequences so every training step sees a full context
  * window (Raffel et al., JMLR 2020 §2.2 describe the T5 variant; the
  * next-fit discipline here is the standard streaming one: close the
  * current pack the moment the next document no longer fits). The
  * assignment is a stateful scan — pack id depends on the ACCUMULATED
  * fill of the current pack, not just the previous row — so unlike
  * sessionization it cannot be rewritten as `lag` + a running sum of
  * boundary flags. Spark's stock answer would be `mapPartitions` over a
  * sorted partition; instead this is an [[AggregateWindowFunction]] (the
  * `row_number`/`rank` machinery): the running `(pack, fill)` state
  * lives in the window aggregate buffer and the update step is pure
  * Catalyst expressions, so the operator composes with the usual
  * `Window.partitionBy(shard).orderBy(id)` and needs no closures, no
  * encoders, and no RDD drop-down.
  *
  * Semantics, for a row stream with token counts `t₁ … tₙ` (nulls read
  * as 0) inside one window partition in frame order:
  *  - the first row opens pack 1;
  *  - row i joins the current pack if `fill + tᵢ <= budget`, else opens
  *    the next pack with `fill = tᵢ`;
  *  - a document with `tᵢ > budget` therefore always sits alone in its
  *    own (oversized) pack — callers decide whether to split or drop it
  *    (see `Packing.packAssignments`'s `oversize` flag).
  *
  * Scale shape: state is two longs per open window partition; the only
  * data movement is the hash exchange on the window partition key, so
  * at 100 TB the operator is one shuffle of (id, token-count) pairs —
  * document bodies are never needed. Packing quality/parallelism trade
  * via the shard count: more shards = more parallel streams, slightly
  * more tail waste (one partially-filled final pack per shard).
  */
case class NextFitPackId(tokens: Expression, budget: Long)
    extends AggregateWindowFunction {
  require(budget > 0 && budget <= Int.MaxValue.toLong,
    s"pack budget must be in (0, 2^31): $budget")

  override def children: Seq[Expression] = Seq(tokens)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "next_fit_pack"

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"next_fit_pack requires an integral token count, got ${other.catalogString}")
  }

  private val pack = AttributeReference("pack", LongType, nullable = false)()
  private val fill = AttributeReference("fill", LongType, nullable = false)()
  override def aggBufferAttributes: Seq[AttributeReference] = pack :: fill :: Nil

  // fill starts past the budget so the first row always opens pack 1 —
  // no special-casing of the empty state in the update step.
  override val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(budget + 1L))

  override val updateExpressions: Seq[Expression] = {
    val t = Coalesce(Seq(Cast(tokens, LongType), Literal(0L)))
    val overflow = GreaterThan(Add(fill, t), Literal(budget))
    Seq(
      If(overflow, Add(pack, Literal(1L)), pack),
      If(overflow, t, Add(fill, t)))
  }

  override val evaluateExpression: Expression = pack

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NextFitPackId =
    copy(tokens = newChildren.head)
}

object PackWindow {
  /** Column wrapper. Builds the Catalyst `WindowExpression` directly
    * instead of going through `Column.over`: the Column-API converter
    * wraps any bare `AggregateFunction` in `toAggregateExpression()`,
    * and `AggregateExpression(windowFunction)` is exactly the shape
    * CheckAnalysis rejects (WINDOW_FUNCTION_WITHOUT_OVER_CLAUSE) —
    * stock window functions dodge this only because they resolve from
    * `UnresolvedFunction`, where the analyzer special-cases
    * `AggregateWindowFunction`. The direct `WindowExpression` takes the
    * normal extract/resolve path and adopts the function's ROWS frame.
    */
  def next_fit_pack(tokens: Column, budget: Long,
                    partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    import org.apache.spark.sql.catalyst.expressions.{
      Ascending, SortOrder, UnspecifiedFrame, WindowExpression,
      WindowSpecDefinition}
    // honor `.desc`/`.asc` on the order columns: those convert to
    // SortOrder; bare columns default to ascending. Must convert
    // EAGERLY — the lazy bridge hop hides the node class until
    // analysis, so the SortOrder match would double-wrap.
    val orders = orderBy.map(GraftSqlBridge.eagerExpression).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    val spec = WindowSpecDefinition(
      partitionBy.map(GraftSqlBridge.expression), orders, UnspecifiedFrame)
    GraftSqlBridge.column(WindowExpression(
      NextFitPackId(GraftSqlBridge.expression(tokens), budget), spec))
  }
}
