package graft

import graft.io.Sinks
import graft.pipeline.Streaming

/** CLI entry point for the event-driven pipeline — the operational
  * surface a user of the reference system switches to:
  *
  *   runMain graft.Pipeline <rawDir> <workDir> [--batch] [--memory-kv]
  *
  * Default mode mirrors the reference end to end: availability gate →
  * AvailableNow streaming run → validate → transform → KV + CSV sinks →
  * archive, exactly-once via checkpoint under `<workDir>/checkpoint`.
  * KPIs land in the DURABLE file-backed KV store under `<workDir>/kv`
  * (the DynamoDB-analog; `--memory-kv` switches to the in-memory test
  * client), and every query termination writes a SUCCEEDED/FAILED
  * status record under `<workDir>/status` — the state-machine Fail-state
  * analog an operator monitors. `--batch` skips the streaming wrapper
  * and runs the pipeline once directly (the two Fargate tasks,
  * `Task_1`/`Task_2`, back to back).
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Pipeline <rawDir> <workDir> [--batch] [--memory-kv]")
    val (rawDir, workDir) = (args(0), args(1))
    val batchMode = args.contains("--batch")
    val memoryKv = args.contains("--memory-kv")
    val spark = Spark.session(appName = "graft-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    val kvDir = s"$workDir/kv"
    val kvFactory: () => Sinks.KvClient =
      if (memoryKv) () => new Sinks.InMemoryKvClient
      else () => new Sinks.FileKvClient(kvDir)
    def kvSizes: (Int, Int) =
      if (memoryKv) (Sinks.InMemoryKv.tableOf("order_kpi").size(),
        Sinks.InMemoryKv.tableOf("category_kpi").size())
      else (Sinks.FileKv.read(kvDir, "order_kpi").size,
        Sinks.FileKv.read(kvDir, "category_kpi").size)

    if (batchMode) {
      graft.pipeline.Batch.runAll(spark, rawDir, workDir, kvFactory)
      println(s"[pipeline] batch run complete; outputs under $workDir")
    } else if (!Streaming.gate(spark, rawDir)) {
      // the Lambda's "Waiting for all the files to be uploaded" branch
      // (reference lambda_trigger.py:87-93)
      println(s"[pipeline] gate closed: waiting for products.csv + orders/ + order_items/ under $rawDir")
    } else {
      val listener = Streaming.withStatusListener(spark, s"$workDir/status")
      try {
        val q = Streaming.runAvailableNow(spark, rawDir, workDir, kvFactory)
        q.awaitTermination()
        val (ord, cat) = kvSizes
        println(s"[pipeline] run complete: order_kpi=$ord rows, category_kpi=$cat rows, outputs under $workDir")
      } finally spark.streams.removeListener(listener)
    }
    spark.stop()
  }
}
