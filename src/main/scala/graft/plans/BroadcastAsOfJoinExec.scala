package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Broadcast as-of join — chosen by [[AsOfJoinStrategy]] when the right
  * (history/dimension) side's estimated size fits the broadcast
  * threshold, exactly like Spark's own join selection.
  *
  * Why it matters at scale: the merge variant ([[AsOfJoinExec]]) hash
  * co-partitions BOTH sides — at 100 TB of events that is one full
  * shuffle of the fact stream. When the right side is broadcast-sized
  * (a dimension's change history usually is), the fact side should not
  * move AT ALL: each task gets the whole right side, builds a per-key
  * time-sorted index once, and streams its left partition through
  * binary searches. Zero exchanges on the fact side, no sort on either
  * side.
  *
  * Same match semantics as the merge exec: latest right row with
  * `r.ts <= l.ts` per key, equal-(key, ts) ties to the largest payload
  * tuple, null keys/timestamps never match.
  */
case class BroadcastAsOfJoinExec(leftKey: Expression, rightKey: Expression,
                                 leftTs: Expression, rightTs: Expression,
                                 payload: Seq[Attribute],
                                 left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val payloadAttrs = payload.map(_.withNullability(true))
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val outAttrs = output
    val tsType = leftTs.dataType

    val broadcastRelation = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions { lIter =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val payloadProj = UnsafeProjection.create(payloadAttrs, rOut)
      val payloadOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(payloadAttrs.map(_.dataType))
      val tsOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(tsType))
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ payloadAttrs)
      val nullPayload = new GenericInternalRow(payloadAttrs.size)
      val joined = new JoinedRow

      // Timestamp columns with a primitive physical representation
      // (timestamp = epoch micros, date = epoch days, the integral
      // types) probe over a primitive long array — the 1M-row probe
      // side otherwise pays an interpreted RowOrdering comparison per
      // binary-search step (the dominant cost of this exec in the
      // round-13 profile). Other types take the generic row path.
      import org.apache.spark.sql.types._
      val tsKind: Int = tsType match {
        case TimestampType | TimestampNTZType | LongType => 0
        case IntegerType | DateType => 1
        case ShortType => 2
        case ByteType => 3
        case _ => -1
      }
      def tsAsLong(r: InternalRow): Long = tsKind match {
        case 0 => r.getLong(0)
        case 1 => r.getInt(0).toLong
        case 2 => r.getShort(0).toLong
        case _ => r.getByte(0).toLong
      }

      // per-JVM index: key -> entries sorted by (ts, payload)
      // ascending. Built ONCE per (broadcast value, join signature)
      // and shared by every task — with 32 executor threads the
      // per-task rebuild this replaces paid the whole group+sort 32×
      // per stage. Weakly keyed on the broadcast array, so the index
      // dies with the broadcast value. (Reads of the shared maps are
      // safe: computeIfAbsent publishes the fully-built,
      // never-mutated-again index.)
      val sig = s"$rKeyExpr|$rTsExpr|${payloadAttrs.mkString(";")}"

      if (tsKind >= 0) {
        val index = BroadcastAsOfJoinExec.indexFor(
          broadcastRelation.value, sig, () => {
            val built = new java.util.HashMap[UnsafeRow,
              BroadcastAsOfJoinExec.LongTsEntries]()
            val grouped = new java.util.HashMap[UnsafeRow,
              scala.collection.mutable.ArrayBuffer[(Long, UnsafeRow)]]()
            broadcastRelation.value.foreach { r =>
              val k = rKeyProj(r)
              val t = rTsProj(r)
              if (!k.isNullAt(0) && !t.isNullAt(0)) {
                val buf = grouped.computeIfAbsent(k.copy(),
                  _ => scala.collection.mutable.ArrayBuffer.empty)
                buf += ((tsAsLong(t), payloadProj(r).copy()))
              }
            }
            grouped.forEach { (k, buf) =>
              val sorted = buf.toArray
              java.util.Arrays.sort(sorted,
                Ordering.Tuple2(Ordering.Long,
                  payloadOrd.on[UnsafeRow](identity)))
              built.put(k, new BroadcastAsOfJoinExec.LongTsEntries(
                sorted.map(_._1), sorted.map(_._2)))
            }
            built
          })
        lIter.map { l =>
          var matched: InternalRow = null
          val lk = lKeyProj(l)
          if (!lk.isNullAt(0)) {
            val e = index.get(lk)
            if (e != null) {
              val lt = lTsProj(l)
              if (!lt.isNullAt(0)) {
                // rightmost ts <= lt over the primitive array (ties
                // resolved by the (ts, payload) sort: last = max)
                val t = tsAsLong(lt)
                val tss = e.tss
                var lo = 0
                var hi = tss.length - 1
                var ans = -1
                while (lo <= hi) {
                  val mid = (lo + hi) >>> 1
                  if (tss(mid) <= t) { ans = mid; lo = mid + 1 }
                  else hi = mid - 1
                }
                if (ans >= 0) matched = e.payloads(ans)
              }
            }
          }
          numOutputRows += 1
          resultProj(joined(l, if (matched == null) nullPayload else matched))
        }
      } else {
        val index = BroadcastAsOfJoinExec.indexFor(
          broadcastRelation.value, sig + "|generic", () => {
            val built = new java.util.HashMap[UnsafeRow,
              Array[(UnsafeRow, UnsafeRow)]]()
            val grouped = new java.util.HashMap[UnsafeRow,
              scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)]]()
            broadcastRelation.value.foreach { r =>
              val k = rKeyProj(r)
              val t = rTsProj(r)
              if (!k.isNullAt(0) && !t.isNullAt(0)) {
                val buf = grouped.computeIfAbsent(k.copy(),
                  _ => scala.collection.mutable.ArrayBuffer.empty)
                buf += ((t.copy(), payloadProj(r).copy()))
              }
            }
            grouped.forEach { (k, buf) =>
              val sorted = buf.toArray
              java.util.Arrays.sort(sorted,
                Ordering.Tuple2(tsOrd.on[UnsafeRow](identity),
                  payloadOrd.on[UnsafeRow](identity)))
              built.put(k, sorted)
            }
            built
          })
        lIter.map { l =>
          var matched: InternalRow = null
          val lk = lKeyProj(l)
          if (!lk.isNullAt(0)) {
            val entries = index.get(lk)
            if (entries != null) {
              val lt = lTsProj(l)
              if (!lt.isNullAt(0)) {
                // rightmost entry with ts <= lt (ties resolved by the
                // ascending (ts, payload) sort: last match = max payload)
                var lo = 0
                var hi = entries.length - 1
                var ans = -1
                while (lo <= hi) {
                  val mid = (lo + hi) >>> 1
                  if (tsOrd.compare(entries(mid)._1, lt) <= 0) {
                    ans = mid; lo = mid + 1
                  } else hi = mid - 1
                }
                if (ans >= 0) matched = entries(ans)._2
              }
            }
          }
          numOutputRows += 1
          resultProj(joined(l, if (matched == null) nullPayload else matched))
        }
      }
    }
  }
}

object BroadcastAsOfJoinExec {

  /** One key's time-sorted entries in the primitive-timestamp fast
    * path: parallel arrays, so a probe's binary search touches only a
    * long[] — no per-step row comparison. */
  private[plans] final class LongTsEntries(val tss: Array[Long],
                                           val payloads: Array[UnsafeRow])

  /** Per-JVM memo of built as-of indexes, weakly keyed on the broadcast
    * value array (entries are reclaimed with the broadcast block) with
    * an inner map per join signature — two different as-of joins can
    * consume one reused broadcast exchange with different key/ts
    * expressions and must not share an index. The HashedRelation
    * build-once-per-executor shape, without a custom BroadcastMode. */
  private val indexCache = new java.util.WeakHashMap[AnyRef,
    java.util.concurrent.ConcurrentHashMap[String, AnyRef]]()

  private[plans] def indexFor[T <: AnyRef](rows: AnyRef, sig: String,
                                           build: () => T): T = {
    val inner = indexCache.synchronized {
      var m = indexCache.get(rows)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
        indexCache.put(rows, m)
      }
      m
    }
    inner.computeIfAbsent(sig, _ => build()).asInstanceOf[T]
  }
}
