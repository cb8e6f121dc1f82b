package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources
import graft.ops.AsOf

class AsOfNativeSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("native as-of join plans through AsOfJoinExec (extension is live)") {
    val left = Seq((1L, 10L, ts("2024-01-05 00:00:00"))).toDF("id", "k", "t")
    val right = Seq((10L, ts("2024-01-01 00:00:00"), 2.0)).toDF("rk", "rt", "v")
    val df = AsOfJoinPlan.asOfJoinNative(left, right, "k", "rk", "t", "rt", Seq("v"))
    df.collect()
    val execs = collect(df.queryExecution.executedPlan) {
      case e: AsOfJoinExec => e
    }
    assert(execs.nonEmpty, "expected AsOfJoinExec in the executed plan")
  }

  test("hand cases: at-or-before match, exact-ts, no-match, null key/ts") {
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
    val out = AsOfJoinPlan.asOfJoinNative(left, right, "k", "rk", "t", "rt", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(2.0), 2L -> None, 3L -> Some(1.0),
      4L -> None, 5L -> None, 6L -> None))
  }

  test("equal (key, ts) right rows tie-break to the largest payload tuple") {
    val left = Seq((1L, 10L, ts("2024-01-05 00:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 3.0),
      (10L, ts("2024-01-01 00:00:00"), 7.0),
      (10L, ts("2024-01-01 00:00:00"), 5.0)
    ).toDF("rk", "rt", "v")
    val out = AsOfJoinPlan.asOfJoinNative(left, right, "k", "rk", "t", "rt", Seq("v"))
      .select("v").as[Double].collect()
    assert(out.toSeq == Seq(7.0))
  }

  test("row-identical to the declarative union+window form on sf0.001") {
    val ev = Sources.table(spark, sf001, "events")
      .select("event_id", "user_id", "ts")
    val ord = Sources.table(spark, sf001, "orders")
    val native = AsOfJoinPlan.asOfJoinNative(ev, ord,
      "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"))
      .select("event_id", "user_id", "o_orderkey", "o_totalprice")
    val declarative = AsOf.asOfJoin(ev, ord,
      "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"))
      .select("event_id", "user_id", "o_orderkey", "o_totalprice")
    assert(native.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(native).isEmpty,
      "native exec and union+window form must agree row for row")
  }
}
