package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — beyond the reference's surface
  * (SURVEY.md §2.C lists as-of among the join types it lacks), but the
  * bread-and-butter temporal lookup of event analytics: enrich each
  * event with the latest dimension/state row at or before its
  * timestamp.
  *
  * Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the naive
  * range-join formulation (`l.key = r.key AND r.ts <= l.ts`, then
  * max-per-event) explodes to every *earlier* right row per event
  * before aggregating — quadratic per key in history length.
  *
  * This is instead the classic union+window linear formulation:
  * tag right rows kind=0 and left rows kind=1, union on (key, ts,
  * kind), and take per key the running `last(payload, ignoreNulls)`
  * over (ts, kind) order. Each row is touched once; the only shuffle
  * is the partitionBy(key) exchange — at 100 TB this is ONE exchange
  * of both inputs and a per-key sort, no row amplification at all.
  * A pathologically hot key (one user with billions of events) would
  * serialize in one partition's sort; the standard mitigation is
  * time-range pre-bucketing of that key, not needed at KPI-shaped
  * cardinalities.
  *
  * Match semantics (identical to DuckDB `ASOF LEFT JOIN ... ON
  * l.key = r.key AND l.ts >= r.ts`):
  *  - a right row at exactly the left timestamp matches (kind 0 sorts
  *    before kind 1 at equal ts);
  *  - left rows with no earlier right row get null payload columns;
  *  - several right rows on the same (key, ts) tie-break to the
  *    largest payload tuple (struct order, first column dominating) —
  *    deterministic across runs and partitionings.
  */
object AsOf {

  /** @param payload right-side columns to carry onto each left row
    *                (names must not collide with left's columns). */
  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    val pSchema = right.select(payload.map(col): _*).schema
    val lT = left.select(
      col(leftKey).as("_k"), col(leftTs).cast("timestamp").as("_ts"),
      lit(1).as("_kind"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_l"),
      lit(null).cast(pSchema).as("_p"))
    // SQL equi-join semantics: NULL keys never match. Window partitioning
    // would otherwise co-group null-key rows from both sides and hand
    // null-key left rows a payload no SQL join would produce.
    val rT = right.filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(
        col(rightKey).as("_k"), col(rightTs).cast("timestamp").as("_ts"),
        lit(0).as("_kind"),
        lit(null).cast(left.schema).as("_l"),
        struct(payload.map(col).toIndexedSeq: _*).as("_p"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_kind"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lT.unionByName(rT)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_kind") === 1)
      .select(col("_l.*") +: payload.map(p => col(s"_m.$p").as(p)): _*)
  }
}
