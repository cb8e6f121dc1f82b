package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "a rare unique specimen"),
    (4L, ""), // token-free after the empty-filter
    (5L, "the the the the")
  ).toDF("doc_id", "text")

  test("unigramSurprisal: hand-checked counts, OOV, and empty doc") {
    val out = CorpusStats.unigramSurprisal(docs, minCount = 2L)
      .orderBy("doc_id").collect()
    assert(out.length == 5, "every input doc gets a row")
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // corpus (T=17): the×7 sat×2, singletons cat on mat dog a rare
    // unique specimen; vocab (c>=2): the(7), sat(2)
    assert(byId(1L).getLong(1) == 6) // n_tokens
    assert(byId(1L).getLong(2) == 3) // cat, on, mat are OOV
    assert(byId(4L).getLong(1) == 0 && byId(4L).getLong(2) == 0)
    assert(byId(4L).isNullAt(3), "token-free doc has null bits_per_token")
    // doc 5: all "the" (c=7, in-vocab): surprisal = bitLen(17)-bitLen(8)=5-4=1
    assert(byId(5L).getLong(2) == 0)
    assert(byId(5L).getDouble(3) == 1.0)
  }

  test("unigramSurprisal: bit-surprisal within 1 bit of true -log2 p") {
    val out = CorpusStats.unigramSurprisal(docs, minCount = 1L)
      .filter($"n_tokens" > 0).collect()
    // with minCount=1 nothing is OOV: check the doc-5 degenerate case and
    // the general bound via a direct recomputation
    val tf = CorpusStats.termFreq(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val corpus = tf.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val total = corpus.values.sum.toDouble
    out.foreach { r =>
      val id = r.getLong(0)
      val toks = tf.filter(_._1 == id)
      val trueBits = toks.map { case (_, t, c) =>
        c * math.log(total / (corpus(t) + 1)) / math.log(2.0)
      }.sum / toks.map(_._3).sum
      val got = r.getDouble(3)
      assert(math.abs(got - trueBits) <= 1.0 + 1e-9,
        s"doc $id: bit-surprisal $got vs true $trueBits drifts over 1 bit")
    }
  }

  test("tfIdfTopK: ranks by score then token, caps at k, ubiquitous terms score 0") {
    val out = CorpusStats.tfIdfTopK(docs, k = 2).orderBy("doc_id", "rank")
      .as[(Long, Int, String, Long, Long, Long)].collect()
    assert(out.forall(_._2 <= 2))
    val doc1 = out.filter(_._1 == 1L)
    // N=5 docs, bitLen(5)=3. "the": df=3, bitLen=2 → idf 1; tf=2 → score 2.
    // cat/sat/on/mat: df 1 (cat,on,mat) → idf 2, score 2; sat df=2 → idf 1.
    // top-2 must be the two lexicographically-smallest score-2 terms: cat, mat
    assert(doc1.map(_._3).toSeq == Seq("cat", "mat"),
      s"tie-break by token: got ${doc1.map(_._3).toSeq}")
    assert(doc1.forall(_._6 == 2L))
  }

  test("tfIdfTopK + unigramSurprisal: invariant under input partitioning") {
    val base = CorpusStats.unigramSurprisal(docs, minCount = 2L)
      .orderBy("doc_id").collect().toSeq
    val repart = CorpusStats.unigramSurprisal(docs.repartition(7), minCount = 2L)
      .orderBy("doc_id").collect().toSeq
    assert(base == repart)
    val t1 = CorpusStats.tfIdfTopK(docs, k = 3)
      .orderBy("doc_id", "rank").collect().toSeq
    val t2 = CorpusStats.tfIdfTopK(docs.repartition(7), k = 3)
      .orderBy("doc_id", "rank").collect().toSeq
    assert(t1 == t2)
  }

  test("sf0.001 documents: surprisal totals are consistent") {
    val d = graft.io.Sources.table(spark, sf001, "documents")
    val out = CorpusStats.unigramSurprisal(d, minCount = 2L)
    val n = d.count()
    assert(out.count() == n)
    val agg = out.agg(
      sum("n_tokens").as("tok"),
      sum("n_oov").as("oov"),
      min("bits_per_token").as("lo"),
      max("bits_per_token").as("hi")).head()
    assert(agg.getLong(1) <= agg.getLong(0), "oov <= tokens")
    assert(agg.getDouble(2) >= 0.0, "surprisal cannot be negative")
    val t = CorpusStats.termFreq(d).agg(sum("tf")).head().getLong(0)
    assert(agg.getLong(0) == t, "per-doc token totals must sum to corpus total")
  }

  test("corpusReport: hand-checked one-row summary") {
    val r = CorpusStats.corpusReport(docs).head()
    assert(r.getLong(0) == 5) // n_docs
    assert(r.getLong(1) == 0) // all texts distinct
    assert(r.getLong(2) == 17) // token instances
    assert(r.getLong(3) == 10) // vocab: the cat sat on mat dog a rare unique specimen
    assert(r.getLong(4) == 1) // the empty doc
    assert(r.getLong(5) == 6) // doc 1
    assert(math.abs(r.getDouble(6) - 17.0 / 4.0) < 1e-12, "mean over token-bearing docs")
  }

  test("mergeVocab: slice-wise vocab merge equals whole-corpus vocab") {
    val d1 = docs.filter($"doc_id" <= 2)
    val d2 = docs.filter($"doc_id" > 2)
    val merged = CorpusStats.mergeVocab(
      CorpusStats.vocab(CorpusStats.termFreq(d1), minCount = 1L),
      CorpusStats.vocab(CorpusStats.termFreq(d2), minCount = 1L))
      .orderBy("token").collect().toSeq
    val whole = CorpusStats.vocab(CorpusStats.termFreq(docs), minCount = 1L)
      .orderBy("token").collect().toSeq
    assert(merged == whole)
    // and pruning after the merge catches cross-slice-common tokens
    // that per-slice pruning would lose: "xyzzy" occurs once per slice
    // (c=1 each) but c=2 overall
    val s1 = Seq((1L, "alpha xyzzy beta beta")).toDF("doc_id", "text")
    val s2 = Seq((2L, "gamma xyzzy delta delta")).toDF("doc_id", "text")
    val prunedAfter = CorpusStats.mergeVocab(
      CorpusStats.vocab(CorpusStats.termFreq(s1), 1L),
      CorpusStats.vocab(CorpusStats.termFreq(s2), 1L))
      .filter($"c" >= 2).select("token").as[String].collect().toSet
    assert(prunedAfter == Set("xyzzy", "beta", "delta"))
    val prunedBefore = CorpusStats.mergeVocab(
      CorpusStats.vocab(CorpusStats.termFreq(s1), 2L),
      CorpusStats.vocab(CorpusStats.termFreq(s2), 2L))
      .select("token").as[String].collect().toSet
    assert(prunedBefore == Set("beta", "delta"), "prune-before-merge loses xyzzy")
  }

  test("bigramSurprisal: hand-computed corpus incl. pruned pair, short and empty docs") {
    // corpus bigram counts: "a b":3, "b a":1, "b c":2; minCount=2 prunes
    // "b a". Context counts over ALL pairs: a·=3, b·=3.
    // surprisal = bitLen(c1+1) - bitLen(c+1):
    //   "a b": bitLen(4)-bitLen(4) = 0;  "b c": bitLen(4)-bitLen(3) = 1
    //   "b a" (pruned -> c=0): bitLen(4)-bitLen(1) = 2
    val docs = Seq(
      (0L, "a b a b c"), // bigrams ab,ba,ab,bc -> bits (0+0+2+1)/4 = 0.75
      (1L, "a b c"),     // ab,bc -> (0+1)/2 = 0.5
      (2L, "x"),         // one token: no bigrams
      (3L, "")           // empty
    ).toDF("doc_id", "text")
    val out = CorpusStats.bigramSurprisal(docs, minCount = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out(0L) == ((4L, 1L, Some(0.75))))
    assert(out(1L) == ((2L, 0L, Some(0.5))))
    assert(out(2L) == ((0L, 0L, None)))
    assert(out(3L) == ((0L, 0L, None)))
  }

  test("corpusReport: exact dups counted; all-empty corpus degrades to zeros") {
    val dup = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val r = CorpusStats.corpusReport(dup).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 1)
    val empty = Seq((1L, ""), (2L, " ")).toDF("doc_id", "text")
    val e = CorpusStats.corpusReport(empty).head()
    assert(e.getLong(0) == 2 && e.getLong(2) == 0 && e.getLong(3) == 0)
    assert(e.getLong(4) == 2 && e.getLong(5) == 0)
    assert(e.getDouble(6) == 0.0)
  }
}
