package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Synthesizes a larger scale factor from an existing testdata directory
  * by replicating the fact tables `factor`× with disjoint key ranges —
  * the sf1 point BASELINE.md needs (~6 M lineitem) without touching the
  * read-only driver testdata.
  *
  * Replication semantics: each copy `i` offsets every orderkey /
  * doc_id / event id by `i * (max_key + 1)`, so join fan-out per key,
  * group cardinalities per key, and selectivity distributions are
  * preserved exactly — the workload gets 10× the rows AND ~10× the
  * groups, which is how real growth behaves (more days × more orders,
  * not denser single keys). Dimension tables (region, nation, customer,
  * supplier, part, embeddings) are copied unchanged: dims grow far
  * slower than facts, and a fixed part table keeps the broadcast-join
  * character of the KPI queries intact at every scale.
  *
  * Document text gets a per-copy suffix token so the scaled corpus is
  * not 10 identical replicas (which would turn every LSH bucket into a
  * 10-clique and measure pathological-duplicate handling instead of
  * normal near-dup discovery density).
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dstDir = if (args.length > 1) args(1) else "benchdata/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.Spark.session(appName = "graft-scaleup")
    spark.sparkContext.setLogLevel("ERROR")

    def copies(df: DataFrame, scale: DataFrame => Int => DataFrame): DataFrame =
      (0 until factor).map(scale(df)).reduce(_ unionByName _)

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dstDir/$name.parquet")

    // dims: copy unchanged
    Seq("region", "nation", "customer", "supplier", "part", "embeddings")
      .foreach(nm => write(Sources.table(spark, srcDir, nm), nm))

    val orders = Sources.table(spark, srcDir, "orders")
    val okStep = maxOf(orders, "o_orderkey")
    write(copies(orders, df => i =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * okStep))), "orders")

    val lineitem = Sources.table(spark, srcDir, "lineitem")
    write(copies(lineitem, df => i =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * okStep))), "lineitem")

    val events = Sources.table(spark, srcDir, "events")
    val evStep = maxOf(events, "event_id")
    write(copies(events, df => i =>
      df.withColumn("event_id", col("event_id") + lit(i * evStep))), "events")

    val docs = Sources.table(spark, srcDir, "documents")
    val docStep = maxOf(docs, "doc_id")
    write(copies(docs, df => i =>
      df.withColumn("doc_id", col("doc_id") + lit(i * docStep))
        .withColumn("text", concat(col("text"), lit(s" c$i")))
        .withColumn("n_chars", length(col("text")).cast("long"))), "documents")

    println(s"scaled $srcDir -> $dstDir x$factor")
    spark.stop()
  }
}
