package graft.tools

import graft.ops.Tokenize

/** Prices BPE training at tokenizer scale: a 1000-merge run under the
  * batched rounds (`bpeTrain` default) vs the per-merge cost implied by
  * single-merge rounds (`batchCap = 1`, measured over a short prefix
  * and extrapolated linearly — running 1000 sequential rounds is
  * exactly the driver-bound behavior the batching removes). The
  * verdict gate: the batched 1k-merge wall-clock must sit WELL under
  * 1000 × the per-round cost. Prints one JSON line. */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 4000L
    val merges = if (args.length > 1) args(1).toInt else 1000
    val probeRounds = if (args.length > 2) args(2).toInt else 20
    val spark = graft.Spark.session(appName = "graft-bpe-bench")
    spark.sparkContext.setLogLevel("ERROR")
    // the sf testdata documents draw from a ~100-word list — BPE
    // saturates at ~107 merges there, far short of tokenizer scale.
    // Synthesize a deterministic ZIPF-LIKE corpus instead: a 256-word
    // vocabulary of md5-hex words (16 base symbols, ~8k learnable
    // merges) whose word frequencies ramp linearly, so top pair counts
    // are mostly DISTINCT — the natural-language shape (uniform-random
    // words are the adversarial case: giant equal-count plateaus force
    // the exactness trim down to single-merge rounds).
    import org.apache.spark.sql.functions._
    val word = (i: Int) => md5(floor(sqrt(pmod(
      xxhash64(col("id") * lit(8) + lit(i)), lit(65536L)))).cast("string"))
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 8).map(word): _*).as("text"))
      .localCheckpoint(true)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm the dictionary path once (parquet footer reads, codegen)
    Tokenize.bpeTrain(docs, 3, minPairCount = 1L).count()

    // single-merge rounds over a short prefix → per-round cost
    val tSingleProbe = time {
      Tokenize.bpeTrain(docs, probeRounds, minPairCount = 1L,
        batchCap = 1).count()
    }
    val perRound = tSingleProbe / probeRounds
    // the batched full run
    var learned = 0L
    val tBatched = time {
      learned = Tokenize.bpeTrain(docs, merges, minPairCount = 1L).count()
    }
    val naive = perRound * merges
    println(
      s"""{"metric":"bpe_train","n_docs":$nDocs,"merges":$merges,""" +
        s""""learned":$learned,"per_round_sec":${f"$perRound%.3f"},""" +
        s""""naive_${merges}x_sec":${f"$naive%.1f"},""" +
        s""""batched_sec":${f"$tBatched%.1f"},""" +
        s""""speedup":${f"${naive / tBatched}%.1f"}}""")
  }
}
