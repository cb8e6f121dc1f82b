package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — beyond the reference's equi-join surface
  * (SURVEY.md §2.C): enrich each left row with an aggregate of the right
  * rows whose timestamp falls in a trailing window `[l.ts − w, l.ts]`
  * for the same key. The temporal-context primitive of feature
  * engineering ("orders this user placed in the 90 days before the
  * event").
  *
  * Why not the naive formulation: `l.key = r.key AND r.ts BETWEEN
  * l.ts − w AND l.ts` plans as a sort-merge join on the key alone with
  * the range as a post-join filter — every left row pairs with the
  * key's ENTIRE right history first (quadratic per key in history
  * length), exactly the blow-up the as-of join avoids ([[AsOf]]).
  *
  * Equi-join-ification instead: quantize time into buckets of exactly
  * the window width. A right row can then only match from the left
  * row's own bucket or the one before it, so replicating each LEFT row
  * to those two probe buckets turns the range join into an equi-join on
  * `(key, bucket)` plus an exact residual range predicate. Row
  * amplification is a constant 2× of the (smaller) probe side; the
  * right side shuffles once, unreplicated; the join carries only key,
  * bucket, timestamp, and the aggregated measures. This is the
  * standard bucketed interval-join scheme (cf. Flink's interval join
  * and the DBMS literature on band joins).
  */
object RangeJoin {

  /** Trailing-window aggregate: for each left row, `COUNT` and a
    * decimal-exact `SUM(measure)` over right rows with the same key in
    * `[l.ts − windowDays, l.ts]`. Left rows with no matches keep
    * count 0 / sum null (left-outer semantics).
    *
    * @param leftId  unique left row id carried through (output grain).
    */
  def trailingWindowAgg(left: DataFrame, right: DataFrame,
                        leftId: String,
                        leftKey: String, rightKey: String,
                        leftTs: String, rightTs: String,
                        measure: String, windowDays: Int): DataFrame = {
    val w = windowDays.toLong * 86400L
    def bucketOf(ts: Column): Column = floor(unix_timestamp(ts) / w)
    val probes = left.select(
        col(leftId), col(leftKey).as("_k"),
        unix_timestamp(col(leftTs).cast("timestamp")).as("_lts"))
      .withColumn("_b", explode(array(
        floor(col("_lts") / w) - 1, floor(col("_lts") / w))))
    val build = right.select(
      col(rightKey).as("_rk"),
      bucketOf(col(rightTs).cast("timestamp")).as("_rb"),
      unix_timestamp(col(rightTs).cast("timestamp")).as("_rts"),
      col(measure).cast(org.apache.spark.sql.types.DecimalType(12, 2)).as("_m"))
    // The range predicate belongs in the JOIN condition: as a post-join
    // filter it would delete a probe row whose candidates are all
    // out-of-range, silently dropping left rows whose window is empty.
    val matched = probes.join(build,
      col("_k") === col("_rk") && col("_b") === col("_rb") &&
        col("_rts") >= col("_lts") - w && col("_rts") <= col("_lts"),
      "left")
    matched.groupBy(col(leftId))
      .agg(count(col("_rts")).as("n_in_window"),
        sum(col("_m")).cast("double").as("sum_in_window"))
  }
}
