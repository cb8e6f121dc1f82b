package graft.functions

import org.apache.spark.sql.{Column, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` (UDAF) surface — SURVEY.md §2.J: the reference
  * needs none, but the training-data extensions do: aggregating
  * embedding vectors per group (class centroids, cluster statistics)
  * is not expressible with one built-in aggregate over an array column
  * without exploding rows first.
  *
  * An `Aggregator[IN, BUF, OUT]` is the right Spark surface: partial
  * aggregation (map-side combine) comes from `reduce`/`merge` exactly
  * like a built-in — at 100 TB the per-partition partials are one
  * `dim`-length array each, and only those cross the wire, vs the
  * posexplode alternative shuffling `rows × dim` (label, pos, value)
  * triples. The explode formulation is kept as the oracle/spec
  * cross-check.
  */
object VectorAgg {

  /** Element-wise INTEGER-QUANTIZED sum of float vectors:
    * `out(i) = Σ floor(x_i · 1000)` as exact longs. Quantizing before
    * the sum makes the result independent of partitioning and merge
    * order (integer addition commutes exactly; float addition does
    * not), so results are identical across runs, cluster sizes, AND
    * engines — the same trick as the `sim_topk_quantized` oracle.
    * Vectors of unequal length zero-pad (shorter inputs contribute
    * nothing to higher dims). */
  val quantizedVectorSum: Aggregator[Array[Float], Array[Long], Array[Long]] =
    new Aggregator[Array[Float], Array[Long], Array[Long]] {
      override def zero: Array[Long] = Array.emptyLongArray
      override def reduce(b: Array[Long], a: Array[Float]): Array[Long] = {
        if (a == null) return b
        val out = if (b.length >= a.length) b
                  else java.util.Arrays.copyOf(b, a.length)
        var i = 0
        while (i < a.length) {
          out(i) += math.floor(a(i).toDouble * 1000).toLong
          i += 1
        }
        out
      }
      override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
        val (big, small) = if (x.length >= y.length) (x, y) else (y, x)
        val out = java.util.Arrays.copyOf(big, big.length)
        var i = 0
        while (i < small.length) { out(i) += small(i); i += 1 }
        out
      }
      override def finish(b: Array[Long]): Array[Long] = b
      override def bufferEncoder: Encoder[Array[Long]] =
        ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] =
        ExpressionEncoder[Array[Long]]()
    }

  /** Column form: `df.groupBy(...).agg(quantized_vector_sum($"embedding"))`. */
  def quantized_vector_sum(c: Column): Column = udaf(quantizedVectorSum).apply(c)

  /** SQL registration (usable as `quantized_vector_sum(embedding)`). */
  def register(spark: SparkSession): Unit =
    spark.udf.register("quantized_vector_sum", udaf(quantizedVectorSum))
}
