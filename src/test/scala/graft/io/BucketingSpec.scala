package graft.io

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing = the write-once shuffle: a join between two tables
  * bucketed on the join key must plan with zero ShuffleExchange nodes. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables runs without any exchange") {
    val li = Sources.table(spark, sf001, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val ord = Sources.table(spark, sf001, "orders")
      .select("o_orderkey", "o_custkey")
    Sinks.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Sinks.writeBucketed(ord, "ord_bucketed", "o_orderkey", 8)

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("l_extendedprice")).as("rev"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val joinShuffles = plan.collect { case e: ShuffleExchangeExec => e }
      .filterNot(_.toString.contains("o_custkey")) // final agg repartition is expected
    assert(joinShuffles.isEmpty,
      s"bucketed join should not shuffle on the join key:\n$plan")
    assert(plan.toString.contains("SelectedBucketsCount"),
      s"scan did not use bucketing metadata:\n$plan")
  }
}
