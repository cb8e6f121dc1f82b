package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer training (Sennrich, Haddow, Birch,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016) — the standard subword-vocabulary learner every LLM data
  * pipeline runs before token budgeting. [[TextAnalysis.tokenCountBpe]]
  * is the cheap regex PROXY for an already-trained tokenizer; this
  * module learns the actual merge table from the corpus.
  *
  * Scale shape (why this survives 100 TB): BPE training never touches
  * the corpus after ONE [[CorpusStats.termFreq]] pass — the working set
  * is the WORD DICTIONARY (distinct words + counts, orders of magnitude
  * smaller than the corpus; Heaps' law says ~O(√N) of it), exactly how
  * the reference BPE implementations train. Each merge round is one
  * pair-count aggregate over the dictionary plus a fold-rewrite of the
  * symbol arrays; the only driver state is the single winning pair per
  * round. Lineage is truncated per round (`localCheckpoint`) so the
  * plan does not grow with `numMerges` — the connectedComponents
  * discipline.
  *
  * Determinism: the winning pair is argmax by (count DESC, left ASC,
  * right ASC) — total order, so the merge table is identical across
  * runs, partitionings, and cluster sizes. No SQL oracle exists for
  * the iterative argmax (the same accepted-internal shape as the HLL
  * sketch and k-means IVF); the gates are the oracle-checked
  * `bpe_pair_counts` sibling (round-0 counts, plain SQL) and the
  * TokenizeSpec parity tests against an independent reference
  * implementation, including the classic low/lower/newest/widest
  * corpus. */
object Tokenize {

  /** End-of-word marker, appended as a terminal symbol so merges can
    * learn suffixes ("est</w>") without crossing word boundaries. */
  val EndOfWord = "</w>"

  private val symsType = ArrayType(StringType, containsNull = false)

  /** Word dictionary of a corpus: distinct whitespace tokens with
    * total instance counts — the only thing BPE training ever scans. */
  def wordDict(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    CorpusStats.termFreq(docs, idCol, textCol)
      .groupBy(col("token")).agg(sum("tf").as("wc"))

  /** Initial symbol array of a word: its characters plus [[EndOfWord]]. */
  def initialSymbols(token: Column): Column =
    concat(
      transform(sequence(lit(1), length(token)), i => token.substr(i, lit(1))),
      array(lit(EndOfWord))).cast(symsType)

  /** Adjacent symbol pairs of a symbol array, as (l, r) structs. */
  private def adjacentPairs(syms: Column): Column =
    transform(sequence(lit(0), size(syms) - 2),
      i => struct(element_at(syms, i + 1).as("l"),
        element_at(syms, i + 2).as("r")))

  /** Corpus-weighted adjacent-pair counts over a symbolized dictionary
    * — one aggregate; this is the per-round cost of training. */
  def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("wc"), explode(adjacentPairs(col("syms"))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("wc").as("pair_count"))

  /** Left-to-right single-pass merge of adjacent (l, r) into the fused
    * symbol — greedy and non-overlapping ("a a a" under (a,a) gives
    * [aa, a]), the BPE contract. One fold, no regex. */
  private[ops] def mergePair(syms: Column, l: String, r: String): Column =
    mergePairs(syms, Seq((l, r)))

  /** One left-to-right pass applying a whole SET of pairwise
    * symbol-disjoint merges simultaneously (lookup = a literal map
    * keyed `l`+NUL+`r`). For disjoint pairs this is EXACTLY the
    * sequential per-pair application: a disjoint merge can neither
    * create nor destroy another batch member's adjacencies (removing
    * an (l,r) pair between two symbols never makes them adjacent —
    * the fused symbol sits between them). This is what makes a batched
    * training round ONE fold pass instead of |batch| chained passes.
    * (A space separates the key halves unambiguously: symbols are
    * whitespace-split tokens and their concatenations, so none can
    * contain a space.) */
  private[ops] def mergePairs(syms: Column,
                              pairs: Seq[(String, String)]): Column = {
    val lookup = map(pairs.flatMap { case (l, r) =>
      Seq(lit(l + "\u0000" + r), lit(l + r))
    }: _*)
    val zero = struct(
      array().cast(symsType).as("out"), lit(null).cast("string").as("prev"))
    aggregate(syms, zero,
      (acc, x) => {
        val out = acc.getField("out")
        val prev = acc.getField("prev")
        val fused = element_at(lookup, concat(prev, lit("\u0000"), x))
        when(prev.isNull, struct(out.as("out"), x.as("prev")))
          .when(fused.isNotNull,
            struct(concat(out, array(fused)).as("out"),
              lit(null).cast("string").as("prev")))
          .otherwise(struct(concat(out, array(prev)).as("out"), x.as("prev")))
      },
      acc => when(acc.getField("prev").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("prev")))))
  }

  /** Learn up to `numMerges` merges. Returns the ordered merge table
    * `(step, left, right, merged, pair_count)`; stops early when no
    * pair reaches `minPairCount`. `words` is re-checkpointed every
    * round, so memory and plan size stay flat in `numMerges`.
    *
    * BATCHED ROUNDS, sequential-identical: a 32k-merge tokenizer as
    * one Spark job per merge is a driver-bound scale-killer (round-8
    * verdict), so each round selects a BATCH of merges that provably
    * commutes with one-at-a-time training and applies them in one
    * rewrite job. The selection is the maximal PREFIX of the
    * (count DESC, l, r)-ranked pair list whose pairs are pairwise
    * SYMBOL-DISJOINT, trimmed to counts STRICTLY above the first
    * conflicting pair's count (`cStop`). Why this is exact:
    *  - merging a pair only changes counts of pairs sharing one of its
    *    symbols, so disjoint batch members keep their exact counts
    *    while earlier members apply;
    *  - every NEW pair `(x, fused)` satisfies `count(x, fused) <=
    *    count_pre(x, l)`, and `(x, l)` shares a symbol with the batch,
    *    so it lies past the prefix: `count_pre(x, l) <= cStop` — the
    *    strictness trim then guarantees no new or excluded pair can
    *    outrank any retained member at its turn;
    *  - ties at `cStop` fall back to a single-merge round (always
    *    sequentially correct), so progress never stalls.
    * TokenizeSpec proves the batched table equals an independent
    * one-merge-at-a-time reference on tie-heavy corpora. Cost: ~2 jobs
    * per ROUND (a pair-count aggregate + one fold-rewrite of up to
    * `batchCap` merges) instead of 2 jobs per MERGE. */
  def bpeTrain(docs: DataFrame, numMerges: Int, minPairCount: Long = 2L,
               idCol: String = "doc_id", textCol: String = "text",
               batchCap: Int = 32,
               maxRounds: Int = Int.MaxValue): DataFrame = {
    require(batchCap >= 1, s"batchCap must be >= 1: $batchCap")
    val spark = docs.sparkSession
    var words = wordDict(docs, idCol, textCol)
      .select(col("wc"), initialSymbols(col("token")).as("syms"))
      .localCheckpoint(true)
    val merges = ArrayBuffer.empty[(Int, String, String, String, Long)]
    var step = 0
    var rounds = 0
    var done = false
    // `maxRounds` bounds the ROUND count (each round = one pair-count
    // aggregate + one fold rewrite) independently of the merge budget —
    // the knob the SQL-replayed `bpe_merges_batched` oracle pins, and a
    // useful job-budget cap on its own
    while (step < numMerges && rounds < maxRounds && !done) {
      rounds += 1
      val r = trainRound(words, math.min(batchCap, numMerges - step),
        minPairCount)
      words = r.words
      if (r.batch.isEmpty) done = true
      else r.batch.foreach { case (l, rt, c) =>
        step += 1; merges += ((step, l, rt, l + rt, c))
      }
    }
    words.unpersist()
    mergeTableDf(docs.sparkSession, merges.toSeq)
  }

  /** The merge-table schema every trainer returns. */
  private def mergeTableDf(
      spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(Int, String, String, String, Long)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.map(Row.fromTuple), 1),
      StructType(Seq(
        StructField("step", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))

  private case class RoundResult(words: DataFrame,
                                 batch: Seq[(String, String, Long)])

  /** ONE training round: select the provably-commuting batch (empty =
    * trained out at `minPairCount`) and fold it into the dictionary in
    * one pass. Shared verbatim by [[bpeTrain]] and
    * [[bpeTrainResumable]] so resumption can never drift from the
    * uninterrupted trainer. */
  private def trainRound(words: DataFrame, budget: Int,
                         minPairCount: Long): RoundResult = {
    // budget+1 rows: the extra row (when present) upper-bounds every
    // pair OUTSIDE the collected prefix
    val top = pairCounts(words)
      .orderBy(col("pair_count").desc, col("l"), col("r"))
      .limit(budget + 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    if (top.isEmpty || top.head._3 < minPairCount) RoundResult(words, Nil)
    else {
      val used = scala.collection.mutable.Set.empty[String]
      val selected = ArrayBuffer.empty[(String, String, Long)]
      // no pair outside the selection may exceed cStop; floor-1 covers
      // the exhausted-dictionary case
      var cStop = minPairCount - 1
      var halted = false
      for (p @ (l, r, c) <- top if !halted) {
        if (c < minPairCount) halted = true
        else if (selected.size == budget || used(l) || used(r)) {
          cStop = c; halted = true
        } else { selected += p; used += l; used += r }
      }
      // strictness trim (counts are non-increasing in rank order);
      // a tie at cStop degrades to the always-correct single merge
      val batch0 = selected.takeWhile(_._3 > cStop)
      val batch = if (batch0.nonEmpty) batch0.toSeq else Seq(top.head)
      // disjointness makes the whole batch ONE fold pass
      val folded = mergePairs(col("syms"), batch.map(p => (p._1, p._2)))
      val next = words.withColumn("syms", folded).localCheckpoint(true)
      words.unpersist()
      RoundResult(next, batch)
    }
  }

  /** [[bpeTrain]] that SURVIVES A RESTART: the merge table and the
    * symbolized word dictionary commit to two manifest tables under
    * `stateDir` every `commitEveryRounds` rounds — atomically, as one
    * [[Manifest.commitAll]] unit, so a crash can never publish a
    * dictionary without its merges or vice versa. A re-run with the
    * same `stateDir` resumes from the last committed state instead of
    * re-paying hours of merge rounds; at most the uncommitted tail of
    * rounds re-trains, and determinism (total-order argmax) makes the
    * resumed table IDENTICAL to an uninterrupted run — TokenizeSpec
    * pins the parity. A 32k-merge production run at the measured
    * 0.07-0.78 s/merge is a multi-hour job; this is its checkpoint.
    *
    * The caller owns argument stability: resuming with a different
    * corpus or `minPairCount` answers for neither. A finished run
    * resumes as a no-op returning the stored table (one pair-count
    * aggregate re-checks early-stop when the budget was not
    * exhausted). */
  def bpeTrainResumable(docs: DataFrame, numMerges: Int, stateDir: String,
                        minPairCount: Long = 2L, idCol: String = "doc_id",
                        textCol: String = "text", batchCap: Int = 32,
                        commitEveryRounds: Int = 8): DataFrame = {
    require(batchCap >= 1, s"batchCap must be >= 1: $batchCap")
    require(commitEveryRounds >= 1,
      s"commitEveryRounds must be >= 1: $commitEveryRounds")
    val spark = docs.sparkSession
    val wordsDir = s"$stateDir/words"
    val mergesDir = s"$stateDir/merges"
    val txns = s"$stateDir/_txns"
    val merges = ArrayBuffer.empty[(Int, String, String, String, Long)]
    var words = Manifest.latestVersion(spark, mergesDir) match {
      case Some(_) =>
        Manifest.read(spark, mergesDir)
          .select("step", "left", "right", "merged", "pair_count")
          .orderBy(col("step")).collect().foreach(r =>
            merges += ((r.getInt(0), r.getString(1), r.getString(2),
              r.getString(3), r.getLong(4))))
        Manifest.read(spark, wordsDir).select("wc", "syms")
          .localCheckpoint(true)
      case None =>
        wordDict(docs, idCol, textCol)
          .select(col("wc"), initialSymbols(col("token")).as("syms"))
          .localCheckpoint(true)
    }
    var step = merges.size
    def commitState(): Unit = {
      // 64 hash buckets: the dictionary overwrite writes one file per
      // bucket, so checkpoint I/O parallelizes and no single file holds
      // the whole Heaps'-law dictionary
      val wdf = words.withColumn("bucket",
        pmod(xxhash64(concat_ws(" ", col("syms"))), lit(64L)))
      val mdf = mergeTableDf(spark, merges.toSeq)
        .withColumn("bucket", lit(0L))
      Manifest.withConflictRetry() {
        Manifest.commitAll(spark, Seq(
          StagedWrite(wordsDir, wdf, "bucket", overwrite = true),
          StagedWrite(mergesDir, mdf, "bucket", overwrite = true)), txns)
      }
    }
    var done = false
    var sinceCommit = 0
    while (step < numMerges && !done) {
      val r = trainRound(words, math.min(batchCap, numMerges - step),
        minPairCount)
      words = r.words
      if (r.batch.isEmpty) done = true
      else {
        r.batch.foreach { case (l, rt, c) =>
          step += 1; merges += ((step, l, rt, l + rt, c))
        }
        sinceCommit += 1
        if (sinceCommit >= commitEveryRounds) {
          commitState(); sinceCommit = 0
        }
      }
    }
    // nothing-learnable runs (no pair reached minPairCount — merges
    // stays empty) skip the state commit entirely: an empty merges
    // frame would be an empty parquet write, and a resume simply
    // re-derives "done" from one pair-count aggregate
    if (merges.nonEmpty &&
      (sinceCommit > 0 || Manifest.latestVersion(spark, mergesDir).isEmpty))
      commitState()
    words.unpersist()
    mergeTableDf(spark, merges.toSeq.takeWhile(_._1 <= numMerges))
  }

  /** Segment a word dictionary with an already-learned merge table —
    * the encode side. `mergeTable` rows are applied in `step` order
    * (collected once; it is vocabulary-sized driver state by
    * construction). Returns `(token, wc, syms)`. */
  def segmentDict(words: DataFrame, mergeTable: DataFrame): DataFrame = {
    val ordered = mergeTable.orderBy(col("step"))
      .select(col("left"), col("right"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    var out = words.withColumn("syms", initialSymbols(col("token")))
    // fold the merges in order; checkpoint every few steps so the plan
    // doesn't deepen linearly in the merge count, releasing the previous
    // checkpoint as soon as the next one is materialized
    var prevCkpt: Option[DataFrame] = None
    ordered.zipWithIndex.foreach { case ((l, r), i) =>
      out = out.withColumn("syms", mergePair(col("syms"), l, r))
      if ((i + 1) % 8 == 0) {
        out = out.localCheckpoint(true)
        prevCkpt.foreach(_.unpersist())
        prevCkpt = Some(out)
      }
    }
    out
  }

  /** Per-document BPE token counts under a learned merge table: encode
    * the DISTINCT words once, then join counts back — documents never
    * re-segment. */
  def bpeTokenCount(docs: DataFrame, mergeTable: DataFrame,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val tf = CorpusStats.termFreq(docs, idCol, textCol)
    val dict = tf.groupBy(col("token")).agg(sum("tf").as("wc"))
    val seg = segmentDict(dict, mergeTable)
      .select(col("token"), size(col("syms")).as("n_pieces"))
    docs.select(col(idCol))
      .join(
        tf.join(seg, Seq("token"))
          .groupBy(col(idCol))
          .agg(sum(col("tf") * col("n_pieces")).as("n_bpe_tokens")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }
}
