package graft.ops

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private lazy val docs = Seq(
    (0L, base),                                        // original
    (1L, base),                                        // exact dup of 0
    (2L, base.replace("lazy", "sleepy")),              // near dup of 0
    (3L, "completely different content about spark partitions and shuffles here"),
    (4L, "unrelated text mentioning databases indexes and storage engines")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts and keeps min id") {
    val d = Dedup.exactByFingerprint(docs, "doc_id", "text")
    assert(d.count() == 4) // 0+1 merged
    val merged = d.filter($"dup_count" === 2).collect()
    assert(merged.length == 1 && merged.head.getAs[Long]("doc_id") == 0L)
  }

  test("minhash estimates jaccard 1.0 for identical docs, high for near-dup") {
    // banding matched to the threshold: at s ≈ 0.55 the default 16×4
    // S-curve knee (~0.5) leaves band collision to chance (~78%); 32×2
    // puts per-band collision at s² ≈ 0.3, recall ≈ 1 — the tuning a
    // production run at threshold 0.3 would use
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        bands = 32, rowsPerBand = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.3)
    assert(!pairs.contains((3L, 4L)) && !pairs.contains((0L, 3L)))
  }

  test("exact ngram jaccard: identical=1.0, disjoint absent, near-dup correct") {
    val near = Dedup.nearDupNgram(docs, "doc_id", "text", threshold = 0.1,
        bands = 32, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(near((0L, 1L)) == 1.0)
    // base has 11 distinct 3-gram shingles (13 words => 11 shingles, all
    // distinct); "lazy"->"sleepy" changes 3 of them: |A∩B| = 8,
    // |A∪B| = 11 + 3 = 14
    assert(math.abs(near((0L, 2L)) - 8.0 / 14.0) < 1e-12)
    assert(!near.contains((3L, 4L)))
  }

  test("simhash: identical docs at hamming 0, near-dups close, unrelated far") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 63)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((0L, 1L)) == 0)
    assert(pairs.get((0L, 2L)).forall(_ <= 16)) // few tokens changed
    // pair (3,4) shares no 16-bit band unless texts are similar; if
    // present it must still be far
    pairs.get((3L, 4L)).foreach(h => assert(h > 10))
  }

  test("simhash xxhash perf variant has the same qualitative structure") {
    // different hash family ⇒ different sketch bits, so no bitwise pair
    // parity with the KR default — but the metric structure must hold:
    // exact dups at hamming 0, near-dups markedly closer than unrelated
    val pairs = Dedup.simHashPairsXx(docs, "doc_id", "text", maxHamming = 63)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((0L, 1L)) == 0)
    assert(pairs.get((0L, 2L)).forall(_ <= 16))
    pairs.get((3L, 4L)).foreach(h => assert(h > 10))
  }

  test("materialized signatures reproduce the in-session minhash pairs") {
    val corpus = graft.io.Sources.table(spark, sf001, "documents")
    val path = java.nio.file.Files.createTempDirectory("graft-sigs").toString
    Dedup.writeSignatures(corpus, "doc_id", "text", path)
    val fromSigs = Dedup.minhashPairsFromSigs(
        spark.read.parquet(path), "doc_id", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val inSession = Dedup.minhashPairs(corpus, "doc_id", "text", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(fromSigs == inSession && fromSigs.nonEmpty)
  }

  test("minhash pair generation is deterministic across runs") {
    def run() = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run() == run())
  }

  test("xxhash64 perf variant finds the same pair set as the KR default") {
    val corpus = graft.io.Sources.table(spark, sf001, "documents")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val kr = pairSet(Dedup.minhashPairs(corpus, "doc_id", "text", threshold = 0.4))
    val xx = pairSet(Dedup.minhashPairsXx(corpus, "doc_id", "text", threshold = 0.4))
    // both are 64-hash estimates of the same Jaccard similarities with
    // the same banding; at this corpus's similarity margins (dups are
    // exact or clearly apart) the pair sets coincide
    assert(kr == xx && kr.nonEmpty)
  }

  test("bucket cap drops a poisoned boilerplate clique; normal pairs survive") {
    // 5,000 identical docs: every band maps them to ONE (band, bucket)
    // key — uncapped, the self-join would emit 12.5 M intra-clique pairs
    // through a single straggler partition. With the cap the degenerate
    // buckets are dropped before any pair forms, while the ordinary
    // near-dup pair (its buckets have size 2) is still found.
    val clique = (0L until 5000L).map(i =>
      (i, "identical boilerplate footer repeated across every crawled page"))
    val normal = Seq((10001L, base), (10002L, base.replace("lazy", "sleepy")))
    val poisoned = (clique ++ normal).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(poisoned, "doc_id", "text",
        bands = 32, rowsPerBand = 2, threshold = 0.3, maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists { case (a, b) => a < 5000L && b < 5000L },
      "no intra-clique pair may survive the cap")
    assert(pairs == Set((10001L, 10002L)),
      "the under-cap near-dup pair must still be found")
  }

  test("semanticDedup keeps the smallest id per within-cluster ε-group") {
    import spark.implicits._
    // the two-round Lehmer hash ranks ids 0,1 lowest of 0..4, so with
    // nlist=2 the ANCHORS are exactly vectors 0 and 1 — place the two
    // distinct directions there so each near-dup co-clusters with its
    // exemplar
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),     // anchor A
      (1L, Array(0.0f, 1.0f)),     // anchor B
      (2L, Array(0.999f, 0.01f)),  // near-dup of 0 -> cluster A
      (3L, Array(0.01f, 0.999f)),  // near-dup of 1 -> cluster B
      (4L, Array(-1.0f, 0.2f))     // lone vector, lands in B, no mate
    ).toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        threshold = 0.95, nlist = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L), "one verdict per input")
    assert(got(0L)._2 && got(1L)._2 && got(4L)._2, "exemplars kept")
    assert(!got(2L)._2, "near-dup of a lower id must drop")
    assert(!got(3L)._2, "near-dup of a lower id must drop")
    // every cluster retains at least one member
    val byCluster = got.values.groupBy(_._1)
    assert(byCluster.values.forall(_.exists(_._2)), s"cluster lost all members: $byCluster")
  }

  test("semanticDedup cap bounds a degenerate cluster; dedup still fires") {
    import spark.implicits._
    // 5,000 identical vectors forced into ONE cluster (nlist=1): uncapped,
    // the within-cluster self-join would emit 12.5 M cosine pairs through
    // one straggler partition. With maxCompare=8 the comparison side is
    // the 8 lowest ids only (≤ 8×5002 pairs) — and unlike the LSH bucket
    // cap, the dedup still FIRES: every clique member matches anchor 0.
    val clique = (0L until 5000L).map(i => (i, Array(1.0f, 0.0f)))
    val strangers = Seq((10001L, Array(0.0f, 1.0f)), (10002L, Array(0.0f, 1.0f)))
    val vecs = (clique ++ strangers).toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        threshold = 0.95, nlist = 1, maxCompare = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got.size == 5002, "one verdict per input")
    assert(got(0L), "clique exemplar kept")
    assert((1L until 5000L).forall(i => !got(i)),
      "every other clique member must drop against a capped anchor")
    assert(got(10001L), "orthogonal vector has no ≥threshold anchor mate")
    // documented cap-semantics difference: 10002's only mate (10001)
    // ranks above the cap, so it stays kept where the uncapped rule
    // would drop it — confined to non-clique members of an over-cap
    // cluster, which nlist sizing is expected to prevent
    assert(got(10002L))
  }

  test("semanticDedup cap is exact-identity for clusters at or under the cap") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.999f, 0.01f)), (3L, Array(0.01f, 0.999f)),
      (4L, Array(-1.0f, 0.2f))
    ).toDF("vec_id", "embedding")
    def run(cap: Int) = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        threshold = 0.95, nlist = 2, maxCompare = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(run(0) == run(1000), "cap must be a no-op when no cluster exceeds it")
  }

  test("incremental near-dup vs the signature index matches the self-join pairs") {
    import org.apache.spark.sql.functions.col
    val corpus = graft.io.Sources.table(spark, sf001, "documents")
    // split: 'old' corpus is indexed, the rest arrives as a new batch
    val old = corpus.filter(col("doc_id") % 2 === 0)
    val batch = corpus.filter(col("doc_id") % 2 === 1)
    val path = java.nio.file.Files.createTempDirectory("graft-inc-sigs").toString
    Dedup.writeSignatures(old, "doc_id", "text", path)
    val inc = Dedup.incrementalNearDup(batch, spark.read.parquet(path),
        "doc_id", "text", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // reference: full self-join pairs restricted to (new, old) id pairs
    val full = Dedup.minhashPairs(corpus, "doc_id", "text", threshold = 0.4)
      .collect().flatMap { r =>
        val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        Seq((a, b) -> j, (b, a) -> j)
      }.toMap
        .filter { case ((n, o), _) => n % 2 == 1 && o % 2 == 0 }
    assert(inc == full && inc.nonEmpty)
  }

  private def bruteEdPairs(strs: Seq[String], maxDist: Int): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val u = strs.distinct
    (for (a <- u; b <- u if a < b; e = lev(a, b) if e >= 1 && e <= maxDist)
      yield (a, b, e)).toSet
  }

  private def fuzzySet(df: org.apache.spark.sql.DataFrame, maxDist: Int,
                       q: Int = 2): Set[(String, String, Int)] =
    Dedup.fuzzyPairs(df, "s", maxDist = maxDist, q = q)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("fuzzyPairs matches brute-force Levenshtein incl. short/empty strings, both q") {
    val strs = Seq(
      "cold bolt", "old bolt", "olt bold", "cold belt", "cold bolts",
      "gear", "year", "years", "ears", "e", "a", "", "ab", "ba",
      "exactly the same", "exactly the same", // exact dups collapse, no 0-dist pair
      "wholly unrelated entity name")
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    for (d <- Seq(1, 2, 3); q <- Seq(2, 3)) {
      assert(fuzzySet(df, d, q) == bruteEdPairs(strs, d), s"maxDist=$d q=$q")
    }
    assert(bruteEdPairs(strs, 2).nonEmpty) // the fixture really exercises pairs
  }

  test("fuzzyPairs: null strings are ignored, deterministic across runs") {
    val df = Seq((1L, Some("abc")), (2L, Some("abd")), (3L, Option.empty[String]))
      .toDF("id", "s")
    val out = fuzzySet(df, 1)
    assert(out == Set(("abc", "abd", 1)))
    assert(fuzzySet(df, 1) == out)
  }

  test("fuzzyPairs: degenerate-bucket cap kills the hot bucket, spares the rest") {
    // "x", "xx", ..., x^120: every string's ENTIRE gram set is a subset
    // of {pad+x, xx, x+pad}, so all 120 share the same ≤3 buckets — the
    // degenerate clique shape. zzz1/zzz2 carry rare grams of their own.
    val clique = (1 to 120).map(i => (i.toLong, "x" * i))
    val df = (clique ++ Seq((900L, "zzz1"), (901L, "zzz2"))).toDF("id", "s")
    val capped = Dedup.fuzzyPairs(df, "s", maxDist = 1, maxBucketSize = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // the x-clique's buckets (size ≥ 118 > 10) are dropped wholesale;
    // the zzz bucket (size 2) survives
    assert(capped == Set(("zzz1", "zzz2", 1)))
    // uncapped finds the 119 consecutive-length x pairs too
    assert(fuzzySet(df, 1).size == 120)
  }
}
