package graft.tools

import org.apache.spark.sql.functions._

import graft.Spark
import graft.io.Sources
import graft.ops.Curation

/** Prices the full curation pipeline (`Curation.curate`) at a big SF
  * with its two lake-scale knobs engaged — the configuration a real
  * 100 TB run uses, exercised end to end:
  *
  *  - near-dup bucket cap at `cap` (default 100): ScaleUp's ~N-copy
  *    template cliques otherwise make stage 4's true pair set quadratic
  *    in the copy factor (the [[MinhashScale]] rationale);
  *  - Bloom contamination: the benchmark slice (`doc_id % 50 == 0`,
  *    matching the declared `doc_curate` query) is 30 k documents at
  *    sf30 — past the embedded-constant `maxShingles` guard, so the
  *    screen goes through the distributed sketch build + exact verify,
  *    which is precisely the guard's prescription.
  *
  * Prints one JSON line with the kept/dropped split so the answer's
  * shape is visible next to the time. */
object CurateScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/benchdata/sf30"
    val cap = if (args.length > 1) args(1).toInt else 100
    val spark = Spark.session(appName = "graft-curate-scale")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Sources.table(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val out = Curation.curate(docs, docs.filter(col("doc_id") % 50 === 0),
      maxBucketSize = cap, bloomContamination = true)
    val Array(kept, dropped) = out
      .select(count(when(col("kept"), 1)), count(when(!col("kept"), 1)))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"curate_scale","sf_dir":"$sfDir","cap":$cap,""" +
      s""""kept":$kept,"dropped":$dropped,"sec":${f"$sec%.1f"}}""")
  }
}
