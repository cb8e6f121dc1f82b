package graft.tools

import org.apache.spark.sql.functions._

/** Phase timing for the man_incr_kpi headliner lifecycle. */
object IncrProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Spark.session(appName = "incr-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val root = s"/tmp/graft_incrprof_$pass"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val baseDir = s"$root/base"; val viewDir = s"$root/view"
      val orders = graft.io.Sources.table(spark, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderstatus"))
      t("create")(graft.ops.Manifest.create(spark, baseDir,
        orders.filter(col("o_orderkey") % 3 =!= 0), "o_orderstatus"))
      t("fullRefresh")(graft.ops.Incremental.refresh(spark, baseDir, viewDir,
        Seq("o_custkey"), "o_totalprice"))
      t("upsert")(graft.ops.Manifest.upsert(spark, baseDir,
        orders.filter(col("o_orderkey") % 2 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        Seq("o_orderkey"), "o_orderstatus"))
      t("delete")(graft.ops.Manifest.delete(spark, baseDir,
        orders.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), col("o_orderstatus")),
        Seq("o_orderkey"), "o_orderstatus"))
      t("deltaRefresh")(graft.ops.Incremental.refresh(spark, baseDir, viewDir,
        Seq("o_custkey"), "o_totalprice"))
      t("read+noop")(graft.ops.Incremental.read(spark, viewDir)
        .select(col("o_custkey"),
          col("sum_value").cast("double").as("sum_value"), col("n_rows"))
        .orderBy(col("o_custkey"))
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
