package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin: latest-at-or-before semantics, exact-ts match, no-match null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")), // after both r rows -> v=20
      (2L, 10L, ts("2024-01-02 00:00:00")), // exactly at r ts    -> v=10
      (3L, 10L, ts("2024-01-01 00:00:00")), // before any r row   -> null
      (4L, 99L, ts("2024-01-05 00:00:00"))  // key with no r rows -> null
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-02 00:00:00"), 10.0),
      (10L, ts("2024-01-03 00:00:00"), 20.0)
    ).toDF("rk", "rt", "v")
    val out = AsOf.asOfJoin(left, right, "k", "rk", "t", "rt", Seq("v"))
      .select("id", "v").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map(1L -> Some(20.0), 2L -> Some(10.0), 3L -> None, 4L -> None))
  }

  test("asOfJoin: same-(key,ts) right rows tie-break to largest payload tuple") {
    val left = Seq((1L, 10L, ts("2024-01-05 00:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-02 00:00:00"), 7L, 1.0),
      (10L, ts("2024-01-02 00:00:00"), 9L, 2.0)
    ).toDF("rk", "rt", "okey", "v")
    val out = AsOf.asOfJoin(left, right, "k", "rk", "t", "rt", Seq("okey", "v"))
      .select("okey", "v").collect().head
    assert(out.getLong(0) == 9L && out.getDouble(1) == 2.0)
  }

  test("asOfJoin: null keys never match (SQL equi-join semantics)") {
    val left = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, null, ts("2024-01-05 00:00:00")),
        org.apache.spark.sql.Row(2L, java.lang.Long.valueOf(10L), null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.TimestampType))))
    val right = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(null, ts("2024-01-01 00:00:00"), 1.0),
        org.apache.spark.sql.Row(java.lang.Long.valueOf(10L), ts("2024-01-01 00:00:00"), 2.0)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rk", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rt", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))))
    val out = AsOf.asOfJoin(left, right, "k", "rk", "t", "rt", Seq("v"))
      .select("id", "v").collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    // null-key left row matches nothing; null-ts left row matches nothing
    assert(out == Map(1L -> true, 2L -> true))
  }

  test("asOfJoin agrees with the naive range-join formulation on sf0.001") {
    val ev = Sources.table(spark, sf001, "events")
      .select("event_id", "user_id", "ts")
    val ord = Sources.table(spark, sf001, "orders")

    val fast = AsOf.asOfJoin(ev, ord, "user_id", "o_custkey", "ts",
      "o_orderdate", Seq("o_orderkey", "o_totalprice"))
      .select("event_id", "o_orderkey")

    // O(n*m)-per-key reference: all earlier orders, keep latest
    // (orderdate, then orderkey) per event.
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val naive = ev.join(ord,
        col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"),
        "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("o_orderkey"))

    val f = fast.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val n = naive.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(f == n)
  }
}
