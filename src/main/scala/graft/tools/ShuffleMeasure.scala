package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Measures total shuffle-write bytes of the production MinHash+LSH
  * pair pipeline against the pre-round-6 plan shape that carried the
  * full 64-long signature through the 16× band explode — the evidence
  * line for BASELINE.md's notes. Run:
  * `sbt "runMain graft.tools.ShuffleMeasure /root/testdata/sf0.1"`. */
object ShuffleMeasure {

  private final class ShuffleBytesListener extends SparkListener {
    val bytes = new AtomicLong(0L)
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  /** The OLD plan shape (kept here only as the measurement baseline):
    * banded self-join with both sides carrying `sig`, scoring inside the
    * join, groupBy-max pair dedup. Semantically identical output. */
  private def carryingPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val bands = 16; val rowsPerBand = 4
    val sigs = graft.io.Sources.fanOut(docs, "doc_id")
      .select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingles(col("text"), 3), bands * rowsPerBand).as("sig"))
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col("doc_id").as("id_a"), col("sig").as("sig_a"),
      col("band"), col("bucket"))
    val b = banded.select(col("doc_id").as("id_b"), col("sig").as("sig_b"),
      col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.minhashJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Spark.session(appName = "graft-shuffle-measure")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.io.Sources.table(spark, sfDir, "documents")

    def measure(tag: String)(mk: => DataFrame): (Long, Long) = {
      val l = new ShuffleBytesListener
      spark.sparkContext.addSparkListener(l)
      val n = mk.count()
      spark.sparkContext.removeSparkListener(l)
      println(s"$tag: pairs=$n shuffleWriteBytes=${l.bytes.get()}")
      (n, l.bytes.get())
    }

    // warm-up to take codegen/JIT out of both measurements
    docs.count()

    def comparePair(tag: String): Unit = {
      val (nNew, bNew) = measure(s"$tag triples-only (current)")(
        Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.4))
      val (nOld, bOld) = measure(s"$tag signature-carry (old shape)")(
        carryingPairs(docs, 0.4))
      require(nNew == nOld, s"pair counts diverged: $nNew vs $nOld")
      println(f"$tag reduction: ${bOld.toDouble / math.max(bNew, 1)}%.2fx " +
        f"(${bOld / 1048576.0}%.1f MiB -> ${bNew / 1048576.0}%.1f MiB)")
    }

    // default regime: bench scale, where small sides broadcast
    comparePair("[broadcast-on]")

    // no-broadcast regime: the 100-TB proxy — no side fits any broadcast
    // threshold, every join pays its shuffle, so the bytes show what the
    // band explode actually carries through the exchange at lake scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    comparePair("[broadcast-off]")
    spark.stop()
  }
}
