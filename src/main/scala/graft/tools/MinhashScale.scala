package graft.tools

import org.apache.spark.sql.functions._

import graft.Spark
import graft.io.Sources
import graft.ops.Dedup

/** Prices `minhashPairs` at a big SF under a chosen bucket cap.
  *
  * Why a knob run and not the stock bench query: `ScaleUp` synthesizes
  * sfN documents as N near-identical copies per base text (tiny ` cI`
  * suffix), so the TRUE near-dup pair set grows quadratically in the
  * copy factor — at sf30 each ~300-copy group stays under the default
  * 1000 bucket cap and contributes ~16·g²/2 candidate rows, billions
  * in total. That measures the answer's size, not the engine: a
  * production dedup drops such boilerplate cliques wholesale, which is
  * exactly what a lower cap does. Prints one JSON line. */
object MinhashScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/benchdata/sf30"
    val cap = if (args.length > 1) args(1).toInt else 100
    val spark = Spark.session(appName = "graft-minhash-scale")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Sources.table(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      maxBucketSize = cap).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"minhash_scale","sf_dir":"$sfDir","cap":$cap,""" +
      s""""pairs":$pairs,"sec":${f"$sec%.1f"}}""")
  }
}
