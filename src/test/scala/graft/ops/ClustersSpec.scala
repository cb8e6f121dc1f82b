package graft.ops

import graft.SparkSpec

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chains close transitively, singletons survive") {
    // 1-2-3-4 is a chain (diameter 3 — needs several propagation rounds),
    // 5 is a singleton, 10-11 a separate pair.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L).toDF("id")
    val out = Dedup.connectedComponents(edges, nodes, "id")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: label is min id regardless of edge orientation") {
    // edges deliberately listed high-to-low
    val edges = Seq((7L, 3L), (9L, 7L)).toDF("id_a", "id_b")
    val nodes = Seq(3L, 7L, 9L).toDF("id")
    val out = Dedup.connectedComponents(edges, nodes, "id")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(3L -> 3L, 7L -> 3L, 9L -> 3L))
  }

  test("nearDupClusters: canonical rows are exactly the cluster minima") {
    val corpus = graft.io.Sources.table(spark, sf001, "documents")
    val out = Dedup.nearDupClusters(corpus, "doc_id", "text", threshold = 0.4)
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == corpus.count(), "every doc gets a cluster")
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, "cluster id is the min member id")
      assert(members.count(_._3) == 1 && members.find(_._3).get._1 == cid,
        "exactly one canonical row per cluster: the minimum")
    }
    // sf0.001 corpus has at least one real near-dup pair at 0.4
    assert(byCluster.exists(_._2.length > 1), "expected a non-trivial cluster")
  }

  test("connectedComponents: reliable-checkpoint branch matches localCheckpoint output") {
    // same graph as the chain test — diameter 3 forces several rounds,
    // so the parquet spill path actually iterates
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L).toDF("id")
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val reliable = Dedup.connectedComponents(edges, nodes, "id",
        checkpointDir = Some(dir))
      .as[(Long, Long)].collect().sorted
    val fast = Dedup.connectedComponents(edges, nodes, "id")
      .as[(Long, Long)].collect().sorted
    assert(reliable.sameElements(fast))
    // the reliable branch really spilled rounds to the checkpoint dir
    val spills = new java.io.File(dir).listFiles()
    assert(spills != null && spills.exists(_.getName.startsWith("labels-")))
  }

  test("connectedComponents: deterministic across reruns") {
    val edges = Seq((1L, 2L), (4L, 5L), (2L, 4L)).toDF("id_a", "id_b")
    val nodes = (1L to 6L).toDF("id")
    val a = Dedup.connectedComponents(edges, nodes, "id").as[(Long, Long)].collect().sorted
    val b = Dedup.connectedComponents(edges, nodes, "id").as[(Long, Long)].collect().sorted
    assert(a.sameElements(b))
    assert(a.toMap.apply(5L) == 1L, "1-2-4-5 all collapse to 1")
  }
}
