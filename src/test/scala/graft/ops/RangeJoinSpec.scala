package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("trailingWindowAgg: hand case — boundaries inclusive, empty windows kept") {
    val left = Seq(
      (1L, 10L, ts("2024-04-10 00:00:00")), // window [01-11, 04-10]
      (2L, 10L, ts("2024-01-05 00:00:00")), // empty window
      (3L, 99L, ts("2024-04-10 00:00:00"))  // key with no right rows at all
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      (10L, ts("2024-04-10 00:00:00"), 1.0),  // exactly at left ts -> in
      (10L, ts("2024-01-11 00:00:00"), 2.0),  // exactly at ts-90d -> in
      (10L, ts("2024-01-10 23:59:59"), 4.0),  // 1s before window -> out
      (10L, ts("2024-05-01 00:00:00"), 8.0)   // after left ts -> out
    ).toDF("k", "rt", "m")
    val out = RangeJoin.trailingWindowAgg(left, right,
      "event_id", "user_id", "k", "t", "rt", "m", windowDays = 90)
      .orderBy("event_id")
      .as[(Long, Long, Option[Double])].collect()
    assert(out.length == 3, "every left row present, even with empty window")
    assert(out(0) == ((1L, 2L, Some(3.0))))
    assert(out(1) == ((2L, 0L, None)))
    assert(out(2) == ((3L, 0L, None)))
  }

  test("trailingWindowAgg agrees with the naive range-join formulation on sf0.001") {
    val ev = Sources.table(spark, sf001, "events")
      .select("event_id", "user_id", "ts")
    val ord = Sources.table(spark, sf001, "orders")
    val bucketed = RangeJoin.trailingWindowAgg(ev, ord, "event_id",
      "user_id", "o_custkey", "ts", "o_orderdate", "o_totalprice", windowDays = 90)
    val w = 90L * 86400L
    val naive = ev
      .join(ord,
        col("user_id") === col("o_custkey") &&
          unix_timestamp(col("o_orderdate").cast("timestamp"))
            .between(unix_timestamp(col("ts")) - w, unix_timestamp(col("ts"))),
        "left")
      .groupBy(col("event_id"))
      .agg(count(col("o_orderkey")).as("n_in_window"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .cast("double").as("sum_in_window"))
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty,
      "bucketed range join must be row-identical to the naive formulation")
  }
}
