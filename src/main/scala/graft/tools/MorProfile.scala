package graft.tools

import org.apache.spark.sql.functions._

/** Phase timing for the man_upsert_mor / man_incr_kpi headliners:
  * which lake op dominates the lifecycle at sf0.1. */
object MorProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Spark.session(appName = "mor-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val dir = s"/tmp/graft_morprof_$pass/orders_tbl"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val orders = graft.io.Sources.table(spark, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      val base = orders.filter(col("o_orderkey") % 3 =!= 0)
      val updates = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      t("create")(graft.ops.Manifest.create(spark, dir, base, "o_orderstatus"))
      t("upsertMor")(graft.ops.Manifest.upsertMor(spark, dir, updates,
        Seq("o_orderkey"), "o_orderstatus"))
      t("deleteMor")(graft.ops.Manifest.deleteMor(spark, dir,
        orders.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), col("o_orderstatus")),
        Seq("o_orderkey"), "o_orderstatus"))
      t("read+noop")(graft.ops.Manifest.read(spark, dir)
        .orderBy(col("o_orderkey"))
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
