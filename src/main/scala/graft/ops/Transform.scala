package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transformation operators (SURVEY.md §2.C/§2.D): the joins and the two
  * KPI aggregations of reference `Task_2/task_2.py:57-139`.
  *
  * Scale notes baked into the design:
  *  - the category lookup is an explicit `broadcast()` — the reference's
  *    `dict.map` (`Task_2/task_2.py:88,97`) IS a manual broadcast hash
  *    join, and the dim table stays small at any fact-table scale;
  *  - the fact-side inner join shuffles both sides on `order_id` once;
  *    both downstream aggregations then group by derived columns, so no
  *    partitioning can be reused — but each agg is a single hash
  *    aggregate with map-side partials;
  *  - `countDistinct` is exact, as the reference computes; at 100 TB an
  *    `approx_count_distinct` (HLL) variant is declared separately rather
  *    than silently substituted.
  */
object Transform {

  /** `prj_is_returned` (reference `Task_2/task_2.py:91`):
    * `is_returned = returned_at IS NOT NULL`. */
  def isReturned(src: String = "returned_at")(df: DataFrame): DataFrame =
    df.withColumn("is_returned", col(src).isNotNull)

  /** `prj_total_price` (reference `Task_2/task_2.py:103`): alias —
    * `sale_price` already accounts for quantity per the reference comment. */
  def totalPrice(src: String = "sale_price")(df: DataFrame): DataFrame =
    df.withColumn("total_price", col(src))

  /** `join_inner_eq` (reference `Task_2/task_2.py:94`): order_items ⋈
    * orders on `order_id`. pandas suffixes duplicate columns `_x`/`_y`;
    * Spark forbids ambiguity, so order-side overlapping columns are
    * prefixed `order_` up front. The reference consumes the item-side
    * `user_id_x` (`Task_2/task_2.py:131`), which maps to the unprefixed
    * `user_id` here — FIXTURES.md §A verified both sides agree on every
    * row anyway. */
  def joinOrdersItems(items: DataFrame, orders: DataFrame): DataFrame = {
    val overlap = orders.columns.toSet.intersect(items.columns.toSet) - "order_id"
    val renamed = overlap.foldLeft(orders)((df, c) => df.withColumnRenamed(c, s"order_$c"))
    items.join(renamed, Seq("order_id"), "inner")
  }

  /** `join_lookup_cat` (reference `Task_2/task_2.py:88,97`): broadcast
    * dimension lookup `product_id → category`; LEFT join preserves the
    * NaN-on-miss semantics of the reference's `dict.map`. */
  def lookupCategory(items: DataFrame, products: DataFrame): DataFrame =
    items.join(
      broadcast(products.select(col("id").as("product_id"), col("category"))),
      Seq("product_id"), "left")

  /** Category KPIs (`agg_cat_kpi`, reference `Task_2/task_2.py:106-121`).
    *
    * Semantics preserved exactly (SURVEY.md §2.D ⚠):
    *  - computed on the joined ITEM grain — orders with more items weigh more;
    *  - `avg_return_rate` = item-level return_count / distinct order count
    *    (mixed-grain ratio, can exceed 1; do not "fix");
    *  - pandas drops null group keys, Spark keeps them → explicit
    *    `category IS NOT NULL` filter;
    *  - rounding is HALF_EVEN (`bround`) to match numpy, with the percent
    *    conversion after the 4dp round and a final 2dp normalization as the
    *    KV sink performs (`Task_2/task_2.py:118-121,172`).
    */
  def catKpi(merged: DataFrame): DataFrame =
    merged
      .filter(col("category").isNotNull)
      .groupBy(col("category"), col("order_date"))
      .agg(
        sum(col("total_price")).as("daily_revenue_raw"),
        countDistinct(col("order_id")).as("order_count"),
        sum(col("is_returned").cast("long")).as("return_count"))
      .withColumn("daily_revenue", bround(col("daily_revenue_raw"), 2))
      .withColumn("avg_order_value",
        bround(col("daily_revenue_raw") / col("order_count"), 2))
      .withColumn("avg_return_rate",
        bround(bround(col("return_count") / col("order_count"), 4) * 100, 2))
      .select("category", "order_date", "daily_revenue", "avg_order_value", "avg_return_rate")

  /** Order KPIs (`agg_order_kpi`, reference `Task_2/task_2.py:124-137`):
    * one hash aggregate, five aggregates, item grain. `return_rate` is the
    * item-weighted mean of `is_returned` (×100, 4dp-then-2dp rounding as
    * the sink normalizes, `Task_2/task_2.py:135-137,190`). */
  def orderKpi(merged: DataFrame): DataFrame =
    merged
      .groupBy(col("order_date"))
      .agg(
        countDistinct(col("order_id")).as("total_orders"),
        sum(col("total_price")).as("total_revenue_raw"),
        count(col("id")).as("total_items_sold"),
        avg(col("is_returned").cast("double")).as("return_rate_raw"),
        countDistinct(col("user_id")).as("unique_customers"))
      .withColumn("total_revenue", bround(col("total_revenue_raw"), 2))
      .withColumn("return_rate", bround(bround(col("return_rate_raw"), 4) * 100, 2))
      .select("order_date", "total_orders", "total_revenue", "total_items_sold",
        "return_rate", "unique_customers")

  /** Full Task-2 composition from validated inputs to both KPI frames
    * (reference `Task_2/task_2.py:57-139`). `is_returned` is derived on
    * the ORDER side before the join (`Task_2/task_2.py:91`), so after the
    * item ⋈ order merge it marks "item row belongs to a returned order" —
    * the item-grain semantics both KPIs depend on. The merged frame is
    * built once and shared by both aggregations — callers may persist it
    * (the reference's materialized `validated/` layer plays that role). */
  def merged(validItems: DataFrame, validOrders: DataFrame, products: DataFrame): DataFrame =
    totalPrice()(
      lookupCategory(
        joinOrdersItems(validItems, isReturned()(validOrders)),
        products))

  def kpis(validItems: DataFrame, validOrders: DataFrame, products: DataFrame)
      : (DataFrame, DataFrame) = {
    val m = merged(validItems, validOrders, products)
    (catKpi(m), orderKpi(m))
  }
}
