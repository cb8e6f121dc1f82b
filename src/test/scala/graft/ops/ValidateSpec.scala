package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.schema.Schemas

/** Unit tests per SURVEY.md §2.B/§2.C validation operators, including the
  * poisoned rows FIXTURES.md §A.4 calls for (the reference corpus is clean,
  * so the rules only fire on synthetic bad rows). */
class ValidateSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val ordersRows = Seq(
    Row(1L, 10L, "delivered", ts("2025-03-08 10:00:00"), null, ts("2025-03-09 10:00:00"), ts("2025-03-10 10:00:00"), 2L),
    Row(2L, 11L, "returned", ts("2025-03-08 11:00:00"), ts("2025-03-12 11:00:00"), ts("2025-03-09 11:00:00"), ts("2025-03-10 11:00:00"), 1L),
    Row(null, 12L, "delivered", ts("2025-03-08 12:00:00"), null, null, null, 1L), // null order_id → dropped
    Row(4L, null, "delivered", ts("2025-03-08 13:00:00"), null, null, null, 1L),  // null user_id → dropped
    Row(5L, 14L, "delivered", null, null, null, null, 1L))                         // null created_at → dropped

  private val itemsRows = Seq(
    Row(100L, 1L, 10L, 1000L, "delivered", ts("2025-03-08 10:05:00"), null, null, null, 50.0),
    Row(101L, 2L, 11L, 1001L, "returned", ts("2025-03-08 11:05:00"), null, null, ts("2025-03-12 11:00:00"), 30.0),
    Row(null, 1L, 10L, 1000L, "delivered", ts("2025-03-08 10:06:00"), null, null, null, 10.0),  // null id → dropped
    Row(103L, 1L, 10L, null, "delivered", ts("2025-03-08 10:07:00"), null, null, null, 10.0),   // null product_id → dropped
    Row(104L, 1L, 10L, 1000L, "delivered", ts("2025-03-08 10:08:00"), null, null, null, null),  // null price → dropped
    Row(105L, 1L, 10L, 1000L, "delivered", ts("2025-03-08 10:09:00"), null, null, null, 0.0),   // price 0 → dropped
    Row(106L, 1L, 10L, 1000L, "delivered", ts("2025-03-08 10:10:00"), null, null, null, -1.5),  // price < 0 → dropped
    Row(107L, 999L, 10L, 1000L, "delivered", ts("2025-03-08 10:11:00"), null, null, null, 20.0)) // orphan order → dropped

  private lazy val orders = spark.createDataFrame(ordersRows.asJava, Schemas.orders)
  private lazy val items = spark.createDataFrame(itemsRows.asJava, Schemas.orderItems)

  test("flt_notnull_orders drops rows with null mandatory keys") {
    val v = Validate.dropNullsAny(Seq("order_id", "user_id", "created_at"))(orders)
    assert(v.select("order_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("flt_price_pos keeps strictly positive prices (after notnull)") {
    val v = Validate.positive("sale_price")(
      Validate.dropNullsAny(Seq("id", "product_id", "sale_price"))(items))
    assert(v.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(100L, 101L, 107L))
  }

  test("join_semi_ri drops orphans without duplicating on valid keys") {
    val validOrders = Validate.dropNullsAny(Seq("order_id", "user_id", "created_at"))(orders)
    val v = Validate.semiJoinRI(validOrders, "order_id")(
      items.filter(items("id").isNotNull))
    assert(v.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(100L, 101L, 103L, 104L, 105L, 106L))
  }

  test("anti-join surfaces exactly the orphans") {
    val validOrders = Validate.dropNullsAny(Seq("order_id", "user_id", "created_at"))(orders)
    val v = Validate.antiJoinOrphans(validOrders, "order_id")(items)
    assert(v.select("id").collect().map(r => Option(r.get(0))).toSet ==
      Set(Some(107L)))
  }

  test("prj_derive_dates is null-preserving") {
    val v = Validate.validateOrders(orders)
    val byId = v.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[java.sql.Date]("order_date").toString == "2025-03-08")
    assert(byId(1L).getAs[java.sql.Date]("return_date") == null)
    assert(byId(2L).getAs[java.sql.Date]("return_date").toString == "2025-03-12")
  }

  test("validateItems composes notnull + positive + RI") {
    val validOrders = Validate.validateOrders(orders)
    val v = Validate.validateItems(items, validOrders)
    assert(v.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(100L, 101L))
  }

  test("quarantine: valid/invalid split is a partition, reasons name failed rules") {
    import org.apache.spark.sql.functions.col
    val df = spark.createDataFrame(
      Seq(
        Row(1L, java.lang.Double.valueOf(5.0)),  // passes both
        Row(2L, java.lang.Double.valueOf(-1.0)), // fails price_pos
        Row(3L, null)                            // null fails both rules
      ).asJava,
      StructType(Seq(StructField("id", LongType), StructField("price", DoubleType))))
    val (valid, invalid) = Validate.quarantine(Map(
      "price_pos" -> (col("price") > 0),
      "price_notnull" -> col("price").isNotNull))(df)
    assert(valid.collect().map(_.getLong(0)).toSeq == Seq(1L))
    val inv = invalid.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](r.fieldIndex("_reasons")).sorted).toMap
    assert(inv == Map(2L -> Seq("price_pos"), 3L -> Seq("price_notnull", "price_pos")))
    assert(valid.count() + invalid.count() == df.count()) // exact partition
  }
}
