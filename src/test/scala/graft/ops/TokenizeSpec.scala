package graft.ops

import graft.SparkSpec

class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent reference implementation (plain Scala) ----

  private def refMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(wordCounts: Map[String, Long], numMerges: Int,
                       minPairCount: Long): Seq[(Int, String, String, Long)] = {
    var dict: Map[Vector[String], Long] = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toVector :+ Tokenize.EndOfWord) -> c
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- dict; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minPairCount =>
          step += 1
          merges += ((step, l, r, c))
          dict = dict.groupMapReduce { case (syms, _) => refMerge(syms, l, r) } {
            case (_, c0) => c0
          }(_ + _)
        case _ => done = true
      }
    }
    merges.result()
  }

  private def trained(docs: org.apache.spark.sql.DataFrame, n: Int,
                      minPair: Long = 2L): Seq[(Int, String, String, Long)] =
    Tokenize.bpeTrain(docs, n, minPair).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .sortBy(_._1).toSeq

  test("bpeTrain matches the reference on the classic low/lower/newest/widest corpus") {
    // Sennrich '16's worked example, as a corpus whose word counts are
    // low:5 lower:2 newest:6 widest:3
    val docs = Seq(
      (0L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
      (1L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    ).toDF("doc_id", "text")
    val expected = refTrain(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L),
      numMerges = 10, minPairCount = 2L)
    val got = trained(docs, 10)
    assert(got == expected)
    // the famous first learned units appear: es -> est -> est</w>
    assert(got.take(3).map(m => m._2 + m._3) ==
      Seq("es", "est", "est" + Tokenize.EndOfWord))
  }

  test("bpeTrain parity with reference on a messier corpus; early stop below minPairCount") {
    val words = Map("aaab" -> 4L, "abab" -> 3L, "banana" -> 2L,
      "bandana" -> 1L, "nab" -> 5L, "x" -> 7L)
    val text = words.toSeq.sortBy(_._1)
      .flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    assert(trained(docs, 25) == refTrain(words, 25, 2L))
    // a high floor stops training early instead of learning noise
    val floored = trained(docs, 25, minPair = 100L)
    assert(floored.isEmpty)
  }

  test("bpeTrainResumable: resumed training equals the uninterrupted run exactly") {
    val words = Map("aaab" -> 4L, "abab" -> 3L, "banana" -> 2L,
      "bandana" -> 1L, "nab" -> 5L, "low" -> 5L, "lower" -> 2L,
      "newest" -> 6L, "widest" -> 3L)
    val text = words.toSeq.sortBy(_._1)
      .flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val full = trained(docs, 14)

    def tbl(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .sortBy(_._1).toSeq

    // "crash" after 6 merges (commit every round so nothing is lost),
    // then resume to the full budget from the committed state
    val state = s"${java.nio.file.Files.createTempDirectory("graft-bpe")}/st"
    val first = tbl(Tokenize.bpeTrainResumable(docs, 6, state,
      batchCap = 2, commitEveryRounds = 1))
    assert(first == full.take(6), "pre-crash prefix must match")
    val resumed = tbl(Tokenize.bpeTrainResumable(docs, 14, state,
      batchCap = 2, commitEveryRounds = 1))
    assert(resumed == full,
      "resumed table must equal the uninterrupted run")
    // merges + dictionary committed ATOMICALLY: both tables exist and
    // the stored merge table IS the returned one
    assert(tbl(Manifest.read(spark, s"$state/merges")
      .select("step", "left", "right", "merged", "pair_count")) == full)
    // a finished run resumes as a stored-table no-op (same result,
    // no new training commits)
    val vBefore = Manifest.versions(spark, s"$state/merges").last
    assert(tbl(Tokenize.bpeTrainResumable(docs, 14, state,
      batchCap = 2, commitEveryRounds = 1)) == full)
    assert(Manifest.versions(spark, s"$state/merges").last == vBefore,
      "a finished run must not re-commit state")
    // an uncommitted TAIL retrains deterministically: commit every 3
    // rounds so the 14-merge run ends with an uncommitted remainder,
    // then resume past it
    val state2 = s"${java.nio.file.Files.createTempDirectory("graft-bpe")}/st"
    Tokenize.bpeTrainResumable(docs, 9, state2,
      batchCap = 2, commitEveryRounds = 3)
    assert(tbl(Tokenize.bpeTrainResumable(docs, 14, state2,
      batchCap = 2, commitEveryRounds = 3)) == full)
  }

  test("bpeTrainResumable: a nothing-learnable corpus returns empty without a state commit") {
    // every word unique → no pair reaches minPairCount → zero merges;
    // committing the empty merge table would be an empty parquet write
    // (code-review finding) — the run must skip the commit and a resume
    // must re-derive "done" from scratch, also without crashing
    val docs = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    val state = s"${java.nio.file.Files.createTempDirectory("graft-bpe0")}/st"
    assert(Tokenize.bpeTrainResumable(docs, 5, state).collect().isEmpty)
    assert(Manifest.latestVersion(spark, s"$state/merges").isEmpty,
      "no state table may be created for zero merges")
    assert(Tokenize.bpeTrainResumable(docs, 5, state).collect().isEmpty)
  }

  test("greedy left-to-right merge: 'a a a' under (a,a) gives [aa, a]") {
    val out = Seq(Tuple1(Seq("a", "a", "a")))
      .toDF("syms")
      .select(Tokenize.mergePair(org.apache.spark.sql.functions.col("syms"),
        "a", "a").as("m"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("aa", "a"))
  }

  test("segmentDict + bpeTokenCount: encoding follows the learned merges") {
    val docs = Seq(
      (0L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
      (1L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    ).toDF("doc_id", "text")
    val table = Tokenize.bpeTrain(docs, 10)
    val seg = Tokenize.segmentDict(Tokenize.wordDict(docs), table)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toVector).toMap
    // reference segmentation: replay the reference merges over each word
    val refMerges = refTrain(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 10, 2L)
    def refSegment(w: String): Vector[String] =
      refMerges.foldLeft(w.map(_.toString).toVector :+ Tokenize.EndOfWord) {
        case (syms, (_, l, r, _)) => refMerge(syms, l, r)
      }
    for (w <- Seq("low", "lower", "newest", "widest"))
      assert(seg(w) == refSegment(w), w)
    // doc-level counts = sum over words of tf * pieces
    val counts = Tokenize.bpeTokenCount(docs, table)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(0L) == 5 * refSegment("low").size + 2 * refSegment("lower").size)
    assert(counts(1L) == 6 * refSegment("newest").size + 3 * refSegment("widest").size)
  }
}
