package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Streaming-merge as-of join (see [[AsOfJoinPlan]] for the contract).
  *
  * Planner requirements mirror sort-merge join: both children hash
  * co-partitioned on the key ([[ClusteredDistribution]] — the planner
  * inserts compatible exchanges), left sorted by (key, ts), right
  * sorted by (key, ts, payload…) so that among equal (key, ts) rows
  * the largest payload tuple is encountered last and wins.
  *
  * Per partition, a single forward pass over both sorted iterators:
  * advance the right side while its (key, ts) is at or before the
  * current left row, remembering only the latest payload for the
  * current key — O(left + right) time, O(1) state, zero buffering of
  * either input. This is the linear-scan plan a native engine would
  * pick, with Spark's exchange/sort machinery doing the distribution.
  */
case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression,
                        payload: Seq[Attribute],
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      payload.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    // bind payload columns as NULLABLE everywhere in this operator: the
    // no-match case substitutes an all-null row, and a projection bound
    // non-nullable would skip the null check and read garbage zeros
    val payloadAttrs = payload.map(_.withNullability(true))
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val payloadProj = UnsafeProjection.create(payloadAttrs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ payloadAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val nullPayload = new GenericInternalRow(payloadAttrs.size)
      val joined = new JoinedRow

      // head of the right iterator, skipping null-key/null-ts rows
      // (SQL equi-join semantics: they can never match)
      var rHeadRow: InternalRow = null
      var rHeadKey: InternalRow = null
      var rHeadTs: InternalRow = null
      def advanceRight(): Unit = {
        rHeadRow = null
        while (rHeadRow == null && rIter.hasNext) {
          val r = rIter.next()
          val k = rKeyProj(r)
          val t = rTsProj(r)
          if (!k.isNullAt(0) && !t.isNullAt(0)) {
            rHeadRow = r
            rHeadKey = k.copy()
            rHeadTs = t.copy()
          }
        }
      }
      advanceRight()

      var curKey: InternalRow = null // key that lastPayload belongs to
      var lastPayload: InternalRow = null

      lIter.map { l =>
        val lk = lKeyProj(l)
        var matched: InternalRow = null
        if (!lk.isNullAt(0)) {
          if (curKey == null || keyOrd.compare(curKey, lk) != 0) {
            curKey = lk.copy()
            lastPayload = null
          }
          // discard right rows before this key
          while (rHeadRow != null && keyOrd.compare(rHeadKey, curKey) < 0) {
            advanceRight()
          }
          val lt = lTsProj(l)
          if (!lt.isNullAt(0)) {
            // consume right rows at this key with ts <= left ts;
            // the last one seen (largest (ts, payload)) wins
            var continue = rHeadRow != null &&
              keyOrd.compare(rHeadKey, curKey) == 0 &&
              tsOrd.compare(rHeadTs, lt) <= 0
            while (continue) {
              lastPayload = payloadProj(rHeadRow).copy()
              advanceRight()
              continue = rHeadRow != null &&
                keyOrd.compare(rHeadKey, curKey) == 0 &&
                tsOrd.compare(rHeadTs, lt) <= 0
            }
            matched = lastPayload
          }
        }
        numOutputRows += 1
        resultProj(joined(l, if (matched == null) nullPayload else matched))
      }
    }
  }
}
