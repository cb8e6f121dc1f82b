package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a typed `Aggregator` — the distributed top-k
  * pattern: each partition keeps a k-element partial (map-side
  * combine), and only `partitions × k` (score, id) pairs cross the
  * wire per group. The window-function formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY score DESC) <= k`)
  * must instead SHUFFLE EVERY SCORED ROW to sort it — at a
  * 100 TB corpus × thousand-query similarity scan that is the
  * difference between moving k·partitions rows and moving the whole
  * cross product.
  *
  * Determinism: ties on score resolve to the smaller id — the same
  * total order the window formulation declares with
  * `ORDER BY sim DESC, id`, so both forms return identical rows.
  */
object TopKAgg {

  /** best-first ordering: higher score, then smaller id */
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def topK(k: Int): Aggregator[(Long, Double), Array[(Double, Long)], Array[(Double, Long)]] =
    new Aggregator[(Long, Double), Array[(Double, Long)], Array[(Double, Long)]] {
      private def sortedTake(xs: Array[(Double, Long)]): Array[(Double, Long)] = {
        val s = xs.sortWith(beats)
        if (s.length > k) s.take(k) else s
      }
      override def zero: Array[(Double, Long)] = Array.empty
      override def reduce(b: Array[(Double, Long)],
                          in: (Long, Double)): Array[(Double, Long)] = {
        val cand = (in._2, in._1)
        // full buffer and candidate no better than the current worst:
        // skip without re-sorting (the common case on a big scan)
        if (b.length == k && !beats(cand, b(k - 1))) b
        else sortedTake(b :+ cand)
      }
      override def merge(x: Array[(Double, Long)],
                         y: Array[(Double, Long)]): Array[(Double, Long)] =
        sortedTake(x ++ y)
      override def finish(b: Array[(Double, Long)]): Array[(Double, Long)] = b
      override def bufferEncoder: Encoder[Array[(Double, Long)]] =
        ExpressionEncoder[Array[(Double, Long)]]()
      override def outputEncoder: Encoder[Array[(Double, Long)]] =
        ExpressionEncoder[Array[(Double, Long)]]()
    }

  /** Column form: `groupBy(g).agg(top_k(5)(idCol, scoreCol))` →
    * best-first `array<struct<_1: score, _2: id>>`. */
  def top_k(k: Int)(id: Column, score: Column): Column =
    udaf(topK(k)).apply(id, score)
}
