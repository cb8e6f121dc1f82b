package graft.tools

import graft.{Spark, SparkEntry}

/** Print the executed (post-AQE) plan of a declared query — the
  * `.explain("formatted")`-and-iterate loop the build rules call for. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("agg_order_kpi")
    val spark = Spark.session(appName = "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save() // finalize AQE
      println(s"===== $n (executed, post-AQE) =====")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
