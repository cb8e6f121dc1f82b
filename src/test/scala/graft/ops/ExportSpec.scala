package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources

class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Sources.table(spark, sf001, "documents")

  test("shuffledShards: permutation — every row exactly once, pos contiguous per shard") {
    val n = docs.count()
    val out = Export.shuffledShards(docs, "doc_id", numShards = 8)
    assert(out.count() == n)
    assert(out.select("doc_id").distinct().count() == n)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .as[(Long, Long, Long, Long)].collect()
    perShard.foreach { case (s, cnt, lo, hi) =>
      assert(lo == 1L && hi == cnt, s"shard $s: pos must be 1..$cnt, got [$lo,$hi]")
    }
  }

  test("shuffledShards: deterministic across runs and input partitionings") {
    val a = Export.shuffledShards(docs, "doc_id", 8)
      .select("doc_id", "shard", "pos").orderBy("shard", "pos").collect().toSeq
    val b = Export.shuffledShards(docs.repartition(13), "doc_id", 8)
      .select("doc_id", "shard", "pos").orderBy("shard", "pos").collect().toSeq
    assert(a == b)
  }

  test("shuffledShards: seed changes the permutation; order decorrelates from id order") {
    val s0 = Export.shuffledShards(docs, "doc_id", 1, seed = 0L)
      .orderBy("pos").select("doc_id").as[Long].collect()
    val s1 = Export.shuffledShards(docs, "doc_id", 1, seed = 42L)
      .orderBy("pos").select("doc_id").as[Long].collect()
    assert(!s0.sameElements(s1), "different seeds must permute differently")
    assert(s0.sorted.sameElements(s1.sorted), "same membership under any seed")
    // decorrelated from ingest order: adjacent output docs are almost
    // never adjacent ids (a sorted-by-id layout would be ~100%)
    val adjacent = s0.sliding(2).count(p => math.abs(p(1) - p(0)) == 1)
    assert(adjacent < s0.length / 10,
      s"$adjacent of ${s0.length} adjacent pairs are id-neighbors")
  }

  test("shuffledShards: shard sizes near-uniform") {
    val sizes = Export.shuffledShards(docs, "doc_id", 8)
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    val n = docs.count()
    assert(sizes.size == 8, "all shards populated")
    val mean = n.toDouble / 8
    sizes.values.foreach(c =>
      assert(c > mean / 3 && c < mean * 3, s"shard size $c far from mean $mean"))
  }

  test("writeShuffled: shard directories on disk, file order is shuffle order") {
    val dir = Files.createTempDirectory("graft-export").toString
    Export.writeShuffled(docs, "doc_id", dir, numShards = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.select("shard").distinct().count() == 4)
    // within each shard file, rows must already lie in shuffle order
    // (a training reader streams the file without sorting)
    val viol = back.select("shard", "shuffle_key", "pos")
      .withColumn("part", spark_partition_id())
      .as[(Int, Long, Long, Int)].collect()
      .groupBy(t => (t._4, t._1)).values
      .count(rows => !rows.map(_._3).sameElements(rows.map(_._3).sorted))
    assert(viol == 0, "rows inside a shard file out of shuffle order")
  }

  test("writeShuffled plan: the explicit shard repartition is the ONLY corpus exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // the PRODUCTION pre-write frame: repartition first, window after —
    // the window's clustered requirement is satisfied, so no 2nd exchange
    val written = Export.shuffledForWrite(docs, "doc_id", 4)
    written.collect()
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = p match {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => shuffles(s.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        shuffles(a.executedPlan)
      case e: ShuffleExchangeExec => e +: e.children.flatMap(shuffles)
      case other => other.children.flatMap(shuffles)
    }
    val n = shuffles(written.queryExecution.executedPlan).size
    assert(n == 1, s"expected exactly one exchange (the shard repartition), got $n")
    // and it writes the same (shard, pos, id) assignment the declared
    // query computes
    val a = written.select("doc_id", "shard", "pos").collect().toSet
    val b = Export.shuffledShards(docs, "doc_id", 4)
      .select("doc_id", "shard", "pos").collect().toSet
    assert(a == b)
  }
}
