package graft.tools

import graft.{Spark, SparkEntry}

/** Ad-hoc steady-state profiler: runs each bench query `reps` times in one
  * JVM and prints every timing, separating first-run (codegen/classload)
  * cost from steady-state execution. Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val only = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = Spark.session(appName = "graft-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (only.isEmpty) SparkEntry.benchQueries
      else SparkEntry.queries.keys.toSeq.sorted.filter(only)
    for (name <- names) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-22s ${times.map(t => f"$t%7.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
