package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IndexSpec extends SparkSpec {
  import spark.implicits._

  // 6 docs: "common" in 5/6 (df over the 0.7 ceiling of 4), "rare"
  // hapax, "mid" in 3, "pair" in 2
  private def docs = Seq(
    (1L, "common mid pair x1"),
    (2L, "common mid pair x2"),
    (3L, "common mid x3"),
    (4L, "common rare x4"),
    (5L, "common x5"),
    (6L, "alone x6")
  ).toDF("doc_id", "text")

  test("postings: stopword ceiling, hapax floor, full df kept on capped lists") {
    val out = Index.postings(docs, minDf = 2L, maxDfFrac = 0.7, maxPostings = 2)
      .orderBy("token")
      .as[(String, Long, Seq[Long])].collect()
    val byTok = out.map(t => t._1 -> t).toMap
    assert(!byTok.contains("common"), "df=5 > floor(6*0.7)=4 must prune")
    assert(!byTok.contains("rare") && !byTok.contains("alone") &&
      !byTok.contains("x1"), "hapaxes must prune")
    assert(byTok("mid")._2 == 3L, "df is the FULL document frequency")
    assert(byTok("mid")._3 == Seq(1L, 2L), "postings capped at 2, ascending")
    assert(byTok("pair")._3 == Seq(1L, 2L))
    assert(out.map(_._1).toSeq == Seq("mid", "pair"))
  }

  test("postings: repeated token in one doc counts once toward df") {
    val d = Seq((1L, "dup dup dup"), (2L, "dup"), (3L, "other z")).toDF("doc_id", "text")
    val out = Index.postings(d, minDf = 2L, maxDfFrac = 1.0, maxPostings = 10)
      .as[(String, Long, Seq[Long])].collect()
    val dup = out.find(_._1 == "dup").get
    assert(dup._2 == 2L && dup._3 == Seq(1L, 2L))
  }

  test("postings: invariant under input partitioning") {
    val a = Index.postings(docs, minDf = 2L, maxDfFrac = 0.7, maxPostings = 2)
      .orderBy("token").collect().toSeq
    val b = Index.postings(docs.repartition(5), minDf = 2L, maxDfFrac = 0.7,
      maxPostings = 2).orderBy("token").collect().toSeq
    assert(a == b)
  }

  test("lookupAll: conjunctive membership over the pruned index") {
    val idx = Index.postings(docs, minDf = 2L, maxDfFrac = 0.7, maxPostings = 10)
    val both = Index.lookupAll(idx, Seq("mid", "pair"))
      .as[Long].collect().sorted.toSeq
    assert(both == Seq(1L, 2L), "docs containing BOTH mid and pair")
    val onlyMid = Index.lookupAll(idx, Seq("mid")).as[Long].collect().sorted.toSeq
    assert(onlyMid == Seq(1L, 2L, 3L))
    // a pruned (stopword) probe token can match nothing
    assert(Index.lookupAll(idx, Seq("common", "mid")).count() == 0)
  }

  test("lookupAll: refuses a probe over a capped posting list (no silent false negatives)") {
    val idx = Index.postings(docs, minDf = 2L, maxDfFrac = 0.7, maxPostings = 2)
    // "mid" has df=3 but its stored list is capped at 2 — membership for
    // the third document is undecidable, so the probe must fail loudly
    val e = intercept[IllegalArgumentException] {
      Index.lookupAll(idx, Seq("mid")).collect()
    }
    assert(e.getMessage.contains("mid"))
    // an uncapped token on the same index still probes fine
    assert(Index.lookupAll(idx, Seq("pair")).count() == 2)
  }

  test("positionalPostings: ascending offsets, repeated occurrences, df pruning") {
    val d = Seq(
      (1L, "new york new york city"),
      (2L, "york new haven"),
      (3L, "city limits z9")
    ).toDF("doc_id", "text")
    val idx = Index.positionalPostings(d, minDf = 1L, maxDfFrac = 1.0)
      .as[(String, Long, Long, Seq[Int])].collect()
    val byKey = idx.map(t => (t._1, t._2) -> t).toMap
    assert(byKey(("new", 1L))._4 == Seq(0, 2), "both occurrences, ascending")
    assert(byKey(("york", 1L))._4 == Seq(1, 3))
    assert(byKey(("new", 2L))._4 == Seq(1))
    assert(byKey(("new", 1L))._3 == 2L, "df counts documents, not occurrences")
    // df pruning still applies
    val pruned = Index.positionalPostings(d, minDf = 2L, maxDfFrac = 1.0)
      .select("token").distinct().as[String].collect().toSet
    assert(pruned == Set("new", "york", "city"))
  }

  test("lookupPhrase: consecutive in-order match only; repeated-token phrases work") {
    val d = Seq(
      (1L, "new york new york city"),
      (2L, "york new haven"),      // both tokens, wrong order
      (3L, "new haven york jail"), // both tokens, not adjacent
      (4L, "visit new york today")
    ).toDF("doc_id", "text")
    val idx = Index.positionalPostings(d, minDf = 1L, maxDfFrac = 1.0)
    val ny = Index.lookupPhrase(idx, Seq("new", "york"))
      .as[Long].collect().sorted.toSeq
    assert(ny == Seq(1L, 4L), s"phrase must be adjacent and ordered: $ny")
    // conjunctive lookupAll over the SAME corpus would also return 2 and 3
    val nyny = Index.lookupPhrase(idx, Seq("new", "york", "new", "york"))
      .as[Long].collect().toSeq
    assert(nyny == Seq(1L), "repeated-token phrase aligns on shifted positions")
    assert(Index.lookupPhrase(idx, Seq("york", "city")).as[Long].collect().toSeq
      == Seq(1L))
    assert(Index.lookupPhrase(idx, Seq("haven", "city")).count() == 0)
  }

  test("sf0.001 documents: postings agree with a direct group-by") {
    val d = graft.io.Sources.table(spark, sf001, "documents")
    val n = d.count()
    val out = Index.postings(d, minDf = 2L, maxDfFrac = 0.8, maxPostings = 50)
    val direct = d
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()
      .groupBy("token").agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= 2 && col("df") <= math.floor(n * 0.8).toLong)
    assert(out.count() == direct.count(), "one row per surviving token")
    val joined = out.join(direct.withColumnRenamed("df", "df2"), "token")
    assert(joined.filter(col("df") =!= col("df2")).count() == 0)
    assert(out.filter(size(col("postings")) > 50).count() == 0)
  }
}
