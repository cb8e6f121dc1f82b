package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.{Spark, SparkEntry}

/** Job-granularity trace of a declared query: registers a listener and
  * prints every Spark job's wall time plus its call site, then the gaps
  * BETWEEN jobs (driver-side work: planning, commit fsyncs, file
  * listing). The sum of job times vs the query wall time says whether
  * to optimize executor plans or driver-side protocol. Not part of the
  * driver contract. */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("man_incr_kpi")
    val spark = Spark.session(appName = "graft-jobtrace")
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = Vector.empty[(Int, String, Long, Long)]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc.put(s.executionId, s.description)
          case _ => ()
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        val site = p.flatMap(x => Option(x.getProperty("spark.sql.execution.id")))
          .map(id => s"execId=$id ${execDesc.getOrDefault(id.toLong, "")}")
          .getOrElse {
            val st = js.stageInfos.headOption
            "RAW " + st.map(_.name).getOrElse("?") + " | " +
              st.map(_.details.linesIterator.filter(_.contains("graft"))
                .take(2).mkString(" <- ")).getOrElse("")
          }
        starts.put(js.jobId, (site, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (site, t0) =>
          jobs = jobs :+ ((je.jobId, site, t0, je.time))
        }
      }
    })
    names.foreach { n =>
      // warm pass (JIT/codegen), then the traced pass
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      jobs = Vector.empty
      val w0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      val sorted = jobs.sortBy(_._3)
      println(s"===== $n wall=${"%.2f".format(wall)}s jobs=${sorted.size} " +
        s"jobTime=${"%.2f".format(sorted.map(j => (j._4 - j._3) / 1e3).sum)}s =====")
      var prevEnd = 0L
      sorted.foreach { case (id, site, t0, t1) =>
        val gap = if (prevEnd == 0L) 0.0 else (t0 - prevEnd) / 1e3
        println(f"job $id%4d ${(t1 - t0) / 1e3}%7.3fs gapBefore=$gap%7.3fs  $site")
        prevEnd = t1
      }
    }
    spark.stop()
  }
}
