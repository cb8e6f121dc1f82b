package graft.tools

import org.apache.spark.sql.functions._

/** One-off profiling main for join_asof_native bench drift (round-13
  * verdict #3): times the query's components separately through the
  * noop sink — scan-only, join-only, join+sort — to localize the
  * drift vs the round-7 0.58 s recording. */
object AsofProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Spark.session(appName = "asof-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def ev = graft.io.Sources.table(spark, d, "events")
      .select("event_id", "user_id", "ts")
    def joined = graft.plans.AsOfJoinPlan.asOfJoinNative(ev,
      graft.io.Sources.table(spark, d, "orders"),
      "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        col("o_totalprice"))
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[asof] $tag pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    time("scan ")(ev)
    time("scan+sort")(ev.orderBy(col("event_id")))
    time("join ")(joined)
    time("join+sort")(joined.orderBy(col("event_id")))
    spark.stop()
  }
}
