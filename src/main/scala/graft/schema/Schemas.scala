package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for every table the engine reads.
  *
  * The reference infers schemas per read (`Task_1/task_1.py:86` via
  * `pd.read_csv`); we declare them so Catalyst resolves plans without a
  * sampling pass and the vectorized readers get stable types. Inference
  * mode remains available via [[graft.io.Sources.csvInferred]] to mirror
  * the reference behavior exactly.
  *
  * Nullability follows the observed corpus (FIXTURES.md §A): `brand`,
  * `returned_at`, `delivered_at` are the only nullable input columns.
  */
object Schemas {

  // -------- e-commerce corpus (reference Data/) --------

  /** `Data/products.csv` — see reference `Task_1/task_1.py:120`. */
  val products: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sku", StringType, nullable = false),
    StructField("cost", DoubleType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("brand", StringType, nullable = true),
    StructField("retail_price", DoubleType, nullable = false),
    StructField("department", StringType, nullable = false)))

  /** `Data/orders/orders_part*.csv` — reference `Task_1/task_1.py:121`. */
  val orders: StructType = StructType(Seq(
    StructField("order_id", LongType, nullable = true), // nullable pre-validation
    StructField("user_id", LongType, nullable = true),
    StructField("status", StringType, nullable = true),
    StructField("created_at", TimestampType, nullable = true),
    StructField("returned_at", TimestampType, nullable = true), // null <=> not returned
    StructField("shipped_at", TimestampType, nullable = true),
    StructField("delivered_at", TimestampType, nullable = true),
    StructField("num_of_item", LongType, nullable = true)))

  /** `Data/order_items/order_items_part*.csv` — reference `Task_1/task_1.py:122`. */
  val orderItems: StructType = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("order_id", LongType, nullable = true),
    StructField("user_id", LongType, nullable = true),
    StructField("product_id", LongType, nullable = true),
    StructField("status", StringType, nullable = true),
    StructField("created_at", TimestampType, nullable = true),
    StructField("shipped_at", TimestampType, nullable = true),
    StructField("delivered_at", TimestampType, nullable = true),
    StructField("returned_at", TimestampType, nullable = true),
    StructField("sale_price", DoubleType, nullable = true)))

  /** Validated-layer orders: input schema + derived date columns
    * (reference `Task_1/task_1.py:135-136`). */
  val validatedOrders: StructType = StructType(orders.fields ++ Seq(
    StructField("order_date", DateType, nullable = true),
    StructField("return_date", DateType, nullable = true)))

  // -------- KPI outputs (reference `Task_2/task_2.py:106-137`) --------

  val categoryKpi: StructType = StructType(Seq(
    StructField("category", StringType, nullable = false),
    StructField("order_date", DateType, nullable = false),
    StructField("daily_revenue", DoubleType, nullable = true),
    StructField("avg_order_value", DoubleType, nullable = true),
    StructField("avg_return_rate", DoubleType, nullable = true)))

  val orderKpi: StructType = StructType(Seq(
    StructField("order_date", DateType, nullable = false),
    StructField("total_orders", LongType, nullable = false),
    StructField("total_revenue", DoubleType, nullable = true),
    StructField("total_items_sold", LongType, nullable = false),
    StructField("return_rate", DoubleType, nullable = true),
    StructField("unique_customers", LongType, nullable = false)))
}
