package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources
import graft.ops.AsOf

class AsOfNativeSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
  /** Force the merge path (threshold -1) or leave the default
    * (broadcast chosen for the tiny test inputs). */
  private def withThreshold[A](v: String)(body: => A): A = {
    val prev = spark.conf.get(thresholdKey)
    spark.conf.set(thresholdKey, v)
    try body finally spark.conf.set(thresholdKey, prev)
  }

  private def native(left: DataFrame, right: DataFrame): DataFrame =
    AsOfJoinPlan.asOfJoinNative(left, right, "k", "rk", "t", "rt", Seq("v"))

  test("strategy picks broadcast for a small right side, merge when disabled") {
    val left = Seq((1L, 10L, ts("2024-01-05 00:00:00"))).toDF("id", "k", "t")
    val right = Seq((10L, ts("2024-01-01 00:00:00"), 2.0)).toDF("rk", "rt", "v")
    val bdf = native(left, right)
    bdf.collect()
    assert(collect(bdf.queryExecution.executedPlan) {
      case e: BroadcastAsOfJoinExec => e
    }.nonEmpty, "small right side must broadcast")
    // the fact side must not shuffle at all on the broadcast path
    assert(collect(bdf.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }.isEmpty, "broadcast as-of must not shuffle either side")
    withThreshold("-1") {
      val mdf = native(left, right)
      mdf.collect()
      assert(collect(mdf.queryExecution.executedPlan) {
        case e: AsOfJoinExec => e
      }.nonEmpty, "threshold -1 must fall back to the streaming merge")
    }
  }

  private def handCase(): Unit = {
    val left = Seq(
      (1L, Some(10L), Some(ts("2024-01-05 00:00:00"))), // normal match
      (2L, Some(10L), Some(ts("2023-12-31 00:00:00"))), // before any right -> null
      (3L, Some(10L), Some(ts("2024-01-01 00:00:00"))), // exact ts -> match
      (4L, None, Some(ts("2024-01-05 00:00:00"))),      // null key -> null
      (5L, Some(10L), None),                            // null ts -> null
      (6L, Some(77L), Some(ts("2024-01-05 00:00:00")))  // key without right rows
    ).toDF("id", "k", "t")
    val right = Seq(
      (Some(10L), Some(ts("2024-01-01 00:00:00")), 1.0),
      (Some(10L), Some(ts("2024-01-04 00:00:00")), 2.0),
      (None, Some(ts("2024-01-01 00:00:00")), 99.0),    // null key never matches
      (Some(77L), None, 98.0)                           // null ts never matches
    ).toDF("rk", "rt", "v")
    val out = native(left, right)
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(2.0), 2L -> None, 3L -> Some(1.0),
      4L -> None, 5L -> None, 6L -> None))
  }

  test("hand cases on the broadcast path (default conf at this scale)") {
    handCase()
  }

  test("hand cases on the merge path (broadcast disabled)") {
    withThreshold("-1") { handCase() }
  }

  private def tieCase(): Unit = {
    val left = Seq((1L, 10L, ts("2024-01-05 00:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 3.0),
      (10L, ts("2024-01-01 00:00:00"), 7.0),
      (10L, ts("2024-01-01 00:00:00"), 5.0)
    ).toDF("rk", "rt", "v")
    val out = native(left, right).select("v").as[Double].collect()
    assert(out.toSeq == Seq(7.0))
  }

  test("equal (key, ts) ties to largest payload on both paths") {
    tieCase()
    withThreshold("-1") { tieCase() }
  }

  test("both physical paths are row-identical to the union+window form on sf0.001") {
    val ev = Sources.table(spark, sf001, "events")
      .select("event_id", "user_id", "ts")
    val ord = Sources.table(spark, sf001, "orders")
    def run(): DataFrame = AsOfJoinPlan.asOfJoinNative(ev, ord,
      "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"))
      .select("event_id", "user_id", "o_orderkey", "o_totalprice")
    val declarative = AsOf.asOfJoin(ev, ord,
      "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"))
      .select("event_id", "user_id", "o_orderkey", "o_totalprice")
    val bcast = run()
    assert(bcast.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(bcast).isEmpty, "broadcast path diverges")
    withThreshold("-1") {
      val merge = run()
      assert(merge.exceptAll(declarative).isEmpty &&
        declarative.exceptAll(merge).isEmpty, "merge path diverges")
    }
  }
}
