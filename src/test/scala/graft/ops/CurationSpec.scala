package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // English-ish docs (stopword-dense so lang_pred = 'en' and the
  // quality stopword term saturates), long enough for len_score ≈ 1
  private def enDoc(tail: String): String =
    ("the quick brown fox jumps over the lazy dog and it is that good " * 3) + tail

  private lazy val docs = Seq(
    (0L, enDoc("original content for the curation test")),
    (1L, enDoc("original content for the curation test")),   // exact dup of 0
    (2L, enDoc("original content for the curation test!!")), // near dup of 0
    (3L, ("a shuffle moves the rows of a table between executors and " +
      "it is the cost that a planner tries to avoid in a query " * 3) +
      "spark partitions bucketing and broadcast joins"),
    (4L, "zzz qqq xxx"),                                     // no stopwords → 'und'
    (5L, "it is a fact that the eval set for a benchmark holds the " +
      "question and the answer pairs that it is graded on and that is it"),
    (6L, "the 12345 67890 ((( ))) !!!")                      // quality: short, digit/punct-heavy
  ).toDF("doc_id", "text")

  // benchmark set = doc 5 itself → doc 5 is fully contaminated
  private lazy val curated =
    Curation.curate(docs, docs.filter($"doc_id" === 5), minQuality = 0.6)

  test("every stage rejects its poisoned doc; first-failure attribution") {
    val stages = curated.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("drop_stage")).toMap
    assert(stages(0L) == null)            // kept: min-id winner
    assert(stages(1L) == "exact")         // identical text, larger id
    assert(stages(2L) == "near_dup")      // near-identical, larger id
    assert(stages(3L) == null)            // kept: distinct content
    assert(stages(4L) == "lang")          // no stopwords → 'und'
    assert(stages(5L) == "contamination") // is the benchmark doc
    assert(stages(6L) == "quality")       // degenerate token stats
  }

  test("kept flag is drop_stage IS NULL; one row per input doc") {
    val rows = curated.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(r => r.getAs[Boolean]("kept") == (r.getAs[String]("drop_stage") == null)))
  }

  test("funnel counts sum to the corpus size and name only real stages") {
    val f = Curation.funnel(curated).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(f.values.sum == docs.count())
    assert((f.keySet - "kept").subsetOf(Curation.Stages.toSet))
  }

  test("kept set is pair-free under the near-dup rule") {
    // every near-dup pair among gate+exact survivors must have lost its
    // larger id — so no pair can have both endpoints kept
    val keptIds = curated.filter($"kept").select($"doc_id").as[Long].collect().toSet
    val surv3 = docs.join(
      curated.filter($"drop_stage".isNull || $"drop_stage".isin("near_dup", "contamination"))
        .select($"doc_id"), Seq("doc_id"))
    val pairs = Dedup.minhashPairs(surv3, "doc_id", "text", threshold = 0.4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => !(keptIds(a) && keptIds(b)) })
  }

  test("lake-scale knobs preserve semantics: bloom contamination is row-identical") {
    // the sf30 configuration (CurateScale): distributed Bloom screen in
    // place of the embedded-constant screen. Exact parity is the whole
    // contract — same rows, same fractions, same verdicts.
    val viaBloom = Curation.curate(docs, docs.filter($"doc_id" === 5),
      minQuality = 0.6, bloomContamination = true)
    val cols = curated.columns.map(col).toSeq
    assert(viaBloom.select(cols: _*).except(curated.select(cols: _*)).isEmpty &&
      curated.select(cols: _*).except(viaBloom.select(cols: _*)).isEmpty,
      "bloom-screened curate must be row-identical to the embedded form")
  }

  test("lake-scale knobs: a cap of 1 drops every near-dup bucket wholesale") {
    // cap=1 makes every 2+ bucket degenerate → stage 4 can't form pairs,
    // so the near-dup doc (2) survives while everything upstream and
    // downstream is unchanged — proving the cap reaches the banded join
    // (and is therefore the real knob CurateScale turns at sf30)
    val capped = Curation.curate(docs, docs.filter($"doc_id" === 5),
      minQuality = 0.6, maxBucketSize = 1)
    val stages = capped.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("drop_stage")).toMap
    assert(stages(2L) == null, "capped-out bucket must not drop the near dup")
    assert(stages(1L) == "exact" && stages(4L) == "lang" &&
      stages(5L) == "contamination" && stages(6L) == "quality")
  }

  test("keepBestInCluster: quality-argmax survivor, id tiebreak, singletons kept") {
    val d = Seq(
      (1L, "aaa", 10L), (2L, "aab", 30L), (3L, "aac", 30L), // cluster 1
      (4L, "zzz", 5L) // singleton
    ).toDF("doc_id", "text", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "cluster_id")
    val out = Curation.keepBestInCluster(d, clusters, "doc_id", col("score"))
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().sorted.toSeq
    // cluster 1: max score 30 tied between 2 and 3 → min id 2 wins
    assert(out == Seq((2L, 1L), (4L, 4L)))
  }

  test("keepTopFraction: exact tie-inclusive cut equals the global-rank contract") {
    val d = Seq(
      (1L, 50L), (2L, 40L), (3L, 40L), (4L, 30L), (5L, 20L),
      (6L, 20L), (7L, 20L), (8L, 10L), (9L, 5L), (10L, 1L)
    ).toDF("doc_id", "score")
    // frac=0.3 → K=3: ranks are 50→1, 40→2,2, 30→4 … keep rank ≤ 3
    val k3 = Curation.keepTopFraction(d, "score", 0.3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(k3 == Seq(1L, 2L, 3L))
    // frac=0.5 → K=5: the 20-tie group at ranks 5-7 is boundary —
    // tie-inclusive keeps all three (7 docs, not 5)
    val k5 = Curation.keepTopFraction(d, "score", 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(k5 == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    // frac=1.0 keeps everything
    assert(Curation.keepTopFraction(d, "score", 1.0).count() == 10)
  }

  test("keepBestInCluster: exactly one survivor per cluster on real data") {
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text", threshold = 0.4)
    val out = Curation.keepBestInCluster(docs, clusters, "doc_id",
      length($"text"))
    val perCluster = out.groupBy("cluster_id").count().filter($"count" =!= 1)
    assert(perCluster.count() == 0, "one winner per cluster")
    assert(out.count() == clusters.select("cluster_id").distinct().count())
  }
}
