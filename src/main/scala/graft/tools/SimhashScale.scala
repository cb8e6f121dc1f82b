package graft.tools

import org.apache.spark.sql.functions._

import graft.Spark
import graft.io.Sources
import graft.ops.Dedup

/** Prices `simHashPairs` at a big SF under a chosen bucket cap — the
  * SimHash sibling of [[MinhashScale]], for the same reason: `ScaleUp`
  * synthesizes sfN documents as N near-identical copies per base text,
  * so every ~N-copy group shares (up to the tiny suffix) one 64-bit
  * sketch, sits together in all four 16-bit bands, and stays under the
  * default 1000 bucket cap — the TRUE Hamming-≤3 pair set grows
  * quadratically in the copy factor and the stock query at sf30
  * measures the answer's size, not the band join. A production dedup
  * drops such template cliques wholesale, which is what a lower cap
  * does. Prints one JSON line. */
object SimhashScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/benchdata/sf30"
    val cap = if (args.length > 1) args(1).toInt else 100
    val spark = Spark.session(appName = "graft-simhash-scale")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Sources.table(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text",
      maxBucketSize = cap).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"simhash_scale","sf_dir":"$sfDir","cap":$cap,""" +
      s""""pairs":$pairs,"sec":${f"$sec%.1f"}}""")
  }
}
