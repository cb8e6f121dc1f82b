package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def orders = Sources.table(spark, sf001, "orders")

  test("sampleByHash: deterministic, repeatable, and near the target rate") {
    val a = Sampling.sampleByHash(orders, "o_orderkey", 0.1)
      .select("o_orderkey").as[Long].collect().sorted
    val b = Sampling.sampleByHash(orders, "o_orderkey", 0.1)
      .select("o_orderkey").as[Long].collect().sorted
    assert(a.sameElements(b), "same key set on every run")
    val total = orders.count()
    val rate = a.length.toDouble / total
    assert(rate > 0.05 && rate < 0.15, s"empirical rate $rate far from 0.1")
  }

  test("sampleByHash: monotone — a 5% sample is a subset of the 20% sample") {
    val small = Sampling.sampleByHash(orders, "o_orderkey", 0.05)
      .select("o_orderkey").as[Long].collect().toSet
    val big = Sampling.sampleByHash(orders, "o_orderkey", 0.20)
      .select("o_orderkey").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("stratifiedSample: unlisted strata drop; listed strata hit their rates") {
    val out = Sampling.stratifiedSample(orders, "o_orderkey", "o_orderstatus",
      Seq("F" -> 0.5, "O" -> 0.1))
    val byStatus = out.groupBy("o_orderstatus").count()
      .as[(String, Long)].collect().toMap
    assert(!byStatus.contains("P"), "stratum without a rate must be dropped")
    val fTotal = orders.filter($"o_orderstatus" === "F").count()
    val fRate = byStatus.getOrElse("F", 0L).toDouble / fTotal
    assert(fRate > 0.4 && fRate < 0.6, s"F rate $fRate far from 0.5")
  }

  test("assignSplit: disjoint, exhaustive, weights respected") {
    val out = Sampling.assignSplit(orders, "o_orderkey",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.filter($"split".isNull).count() == 0, "every row gets a split")
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    val total = counts.values.sum
    assert(total == orders.count(), "splits partition the input")
    val trainRate = counts("train").toDouble / total
    assert(trainRate > 0.75 && trainRate < 0.85, s"train rate $trainRate far from 0.8")
  }

  test("hash bucket scatters sequential keys (not an arithmetic progression)") {
    val buckets = spark.range(0, 1000)
      .select(Sampling.hashBucket(col("id"), 10).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    assert(buckets.size == 10, "all 10 buckets hit")
    // a degenerate mapping would put sequential ids in ~1 bucket
    assert(buckets.values.max < 300, s"bucket skew too high: $buckets")
  }

  test("temperatureMixture: sqrt smoothing upweights the low-resource domain") {
    // 400 "big" rows vs 16 "small": w = 20 vs 4, K = 208,
    // quotas 173 vs 34 — small's quota EXCEEDS its size, so it keeps
    // everything while big keeps ~43%; proportional would keep 50/50
    val d = spark.range(0, 416)
      .select(col("id"), when(col("id") < 400, "big").otherwise("small").as("dom"))
    val out = Sampling.temperatureMixture(d, "id", "dom", targetFrac = 0.5)
    val kept = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 16L, "saturated quota keeps the whole small domain")
    val bigRate = kept("big").toDouble / 400
    assert(bigRate > 0.33 && bigRate < 0.53, s"big domain rate $bigRate far from quota 173/400")
    // deterministic: same rows on re-run and under repartitioning
    val again = Sampling.temperatureMixture(d.repartition(7), "id", "dom", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == out.select("id").as[Long].collect().sorted.toSeq)
  }

  test("capPerDomain: exact cap, full retention under it, deterministic subset") {
    val docs = Sources.table(spark, sf001, "documents")
    val out = Sampling.capPerDomain(docs, "doc_id", "lang", maxPerDomain = 10)
    val perLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang.values.forall(_ <= 10), s"cap violated: $perLang")
    val langTotals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    langTotals.foreach { case (l, n) =>
      assert(perLang.getOrElse(l, 0L) == math.min(n, 10L),
        s"lang $l kept ${perLang.getOrElse(l, 0L)} of $n at cap 10")
    }
    val a = out.select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.capPerDomain(docs.repartition(5), "doc_id", "lang", 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, "survivor set must be partitioning-invariant")
    // survivors are rank-selected, not a doc_id prefix
    val first = docs.orderBy("doc_id").limit(a.length)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a != first, "cap must select by hash rank, not ingest order")
  }

  test("leakageSafeSplit: a near-dup family never straddles splits") {
    val docs = Sources.table(spark, sf001, "documents")
    val ids = docs.select($"doc_id")
    val allPairs = ids.select($"doc_id".as("id_a"))
      .crossJoin(ids.select($"doc_id".as("id_b")))
      .filter($"id_a" < $"id_b")
    val edges = Dedup.ngramJaccard(allPairs, docs, "doc_id", "text", n = 3)
      .filter($"jaccard" >= 0.5).select("id_a", "id_b")
    val clusters = Dedup.connectedComponents(edges, ids, "doc_id")
    val out = Sampling.leakageSafeSplit(docs, clusters, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.count() == docs.count(), "every doc assigned")
    assert(out.filter($"split".isNull).count() == 0)
    val mixed = out.groupBy("cluster_id")
      .agg(countDistinct("split").as("n_splits"))
      .filter($"n_splits" > 1)
    assert(mixed.count() == 0, "cluster members must share a split")
    // and the split is genuinely cluster-keyed: a doc-keyed split over
    // the same corpus DOES straddle at least one multi-member cluster
    // (guards against the test passing vacuously on singleton-only data)
    val multi = clusters.groupBy("cluster_id").count().filter($"count" > 1)
    assert(multi.count() > 0, "fixture must contain a real dup family")
    val naive = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .join(clusters, "doc_id")
      .groupBy("cluster_id").agg(countDistinct("split").as("n"))
      .filter($"n" > 1)
    assert(naive.count() > 0,
      "doc-keyed split straddles a family here — the leak this op closes")
  }
}
