package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relative document statistics: unigram language-model scoring
  * and TF-IDF term extraction. Unlike [[TextAnalysis]] (pure per-row
  * scan expressions), these need a corpus pass first — vocabulary
  * counts, document frequencies — and then score each document against
  * the aggregate, the CCNet/Gopher shape for perplexity-style quality
  * filtering (Wenzek et al. '19 filter CommonCrawl by LM perplexity;
  * Rae et al. '21 §A1 use corpus-frequency signals).
  *
  * All arithmetic is integral until the final mean: the log2 in both
  * surprisal and IDF is the integer bit length (`floor(log2 x) + 1`,
  * within 1 bit of the real thing — spec'd), so every score replays
  * bit-for-bit in the DuckDB oracle with no transcendental-function
  * cross-engine drift. A production variant wanting fractional bits
  * would swap [[bitLen]] for `log2` and lose only the oracle, not the
  * plan shape.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - token instances never shuffle: [[termFreq]] explodes in place and
  *    the (doc, token) group-by partial-aggregates each document's
  *    repeats down to distinct terms before its exchange — the shuffle
  *    carries per-document term COUNTS, not token instances;
  *  - the vocabulary (min-count-pruned) and the single-row corpus
  *    total are broadcast — document rows never move for the lookup;
  *  - the per-document reduce group-bys `doc_id`, which partial-
  *    aggregates again before the final exchange.
  */
object CorpusStats {

  /** Integer bit length of a positive integral column: `floor(log2 x)+1`
    * (= `LENGTH(bin(x))`; DuckDB replay `LENGTH(printf('%b', x))`). */
  def bitLen(x: Column): Column = length(bin(x))

  /** Per-document term frequencies `(id, token, tf)` — whitespace
    * tokens, lowercased, empties dropped. The group-by's map-side
    * combine collapses each document's repeated tokens before any
    * exchange. */
  def termFreq(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    graft.io.Sources.fanOut(docs, idCol)
      .select(col(idCol),
        explode(TextAnalysis.nonEmptyTokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus vocabulary over a term-frequency frame: total instance
    * count and document frequency per token, pruned to tokens with at
    * least `minCount` instances (the prune bounds the broadcast). */
  def vocab(tf: DataFrame, minCount: Long): DataFrame =
    tf.groupBy("token")
      .agg(sum("tf").as("c"), count(lit(1)).as("df"))
      .filter(col("c") >= minCount)

  /** Merge vocabulary tables from disjoint corpus slices — the
    * incremental-ingest path for corpus statistics: a new batch's vocab
    * (computed from the batch alone) folds into the standing artifact
    * by token-keyed addition, so corpus-frequency signals stay current
    * without re-tokenizing history. `(token, c, df)` counts are
    * additive EXACTLY when the slices partition the corpus by document
    * (a document spanning slices would double-count its df — the
    * caller's contract).
    *
    * Apply `minCount` pruning AFTER merging (prune-then-merge
    * undercounts tokens that are rare in each slice but common
    * overall), which is why this takes unpruned vocab frames. */
  def mergeVocab(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "no vocab parts")
    parts.reduce(_.unionByName(_))
      .groupBy("token")
      .agg(sum("c").as("c"), sum("df").as("df"))
  }

  /** Unigram-LM surprisal per document: mean over token instances of
    * `bitLen(T) − bitLen(c+1)` where `T` is the corpus token-instance
    * total and `c` the token's corpus count (0 when out-of-vocabulary —
    * add-one smoothing keeps the bit length defined). The mean is
    * log2-perplexity within 1 bit per token; callers wanting the
    * perplexity itself raise 2^bits (kept out of the frame so the
    * declared output stays in exact arithmetic).
    *
    * Every input document appears in the result — token-free documents
    * carry `n_tokens = 0` and null `bits_per_token` rather than
    * silently dropping (curation treats "no tokens" as its own signal,
    * not as "no row").
    */
  def unigramSurprisal(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text",
                       minCount: Long = 2L): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val v = vocab(tf, minCount).select(col("token"), col("c"))
    val total = tf.agg(sum("tf").as("corpus_tokens"))
    val scored = tf
      .join(broadcast(v), Seq("token"), "left")
      .crossJoin(broadcast(total))
      .withColumn("surprisal",
        bitLen(col("corpus_tokens")) - bitLen(coalesce(col("c"), lit(0L)) + 1))
      .groupBy(col(idCol))
      .agg(
        sum("tf").as("n_tokens"),
        sum(when(col("c").isNull, col("tf")).otherwise(0L)).as("n_oov"),
        (sum(col("tf") * col("surprisal")).cast("double") /
          sum("tf").cast("double")).as("bits_per_token"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        col("bits_per_token"))
  }

  /** Per-document bigram frequencies `(id, bigram, tf)` where `bigram`
    * is the space-joined adjacent token pair. Built explicitly (NOT via
    * [[Dedup.shingles]], whose short-document fallback would fabricate
    * a fake "bigram" from a one-token document); documents with fewer
    * than two tokens contribute no rows. Same shuffle discipline as
    * [[termFreq]]: instances collapse to per-document counts map-side. */
  def bigramFreq(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.nonEmptyTokens(col(textCol))
    graft.io.Sources.fanOut(docs, idCol)
      .select(col(idCol), toks.as("_toks"))
      .filter(size(col("_toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("_toks")) - 2),
        i => concat_ws(" ", element_at(col("_toks"), i + 1),
          element_at(col("_toks"), i + 2)))).as("bigram"))
      .groupBy(col(idCol), col("bigram"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Bigram conditional surprisal per document — the next step up from
    * [[unigramSurprisal]] on the CCNet/KenLM ladder (Wenzek et al. '19
    * score documents by n-gram-LM perplexity; bigrams are the smallest
    * model that sees word ORDER, so shuffled-word spam that sails
    * through unigram scoring lights up here).
    *
    * Per bigram instance the surprisal is `log2 P(w2|w1)⁻¹` in integer
    * bits: `bitLen(c(w1·)+1) − bitLen(c(w1w2)+1)`, where `c(w1·)` is
    * the corpus count of bigrams starting with `w1` (the conditional's
    * denominator) and `c(w1w2)` the pruned-vocabulary count of the pair
    * (0 when pruned/unseen — the +1 is the same add-one floor the
    * unigram path uses). `c(w1w2) ≤ c(w1·)` always, so the difference
    * is non-negative. Emits `(id, n_bigrams, n_unseen,
    * bits_per_bigram)`; documents under two tokens keep null bits.
    *
    * Scale shape: identical to the unigram path — bigram instances
    * collapse map-side in [[bigramFreq]]; the pruned pair vocabulary
    * and the context-count table (unigram-vocabulary-sized) broadcast;
    * bodies never move. */
  def bigramSurprisal(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text",
                      minCount: Long = 2L): DataFrame = {
    val bf = bigramFreq(docs, idCol, textCol)
    val pairV = vocab(bf.withColumnRenamed("bigram", "token"), minCount)
      .select(col("token").as("bigram"), col("c"))
    val ctx = bf.groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum("tf").as("c1"))
    val scored = bf
      .join(broadcast(pairV), Seq("bigram"), "left")
      .join(broadcast(ctx),
        substring_index(col("bigram"), " ", 1) === col("w1"), "left")
      .withColumn("surprisal",
        bitLen(coalesce(col("c1"), lit(0L)) + 1) -
          bitLen(coalesce(col("c"), lit(0L)) + 1))
      .groupBy(col(idCol))
      .agg(
        sum("tf").as("n_bigrams"),
        sum(when(col("c").isNull, col("tf")).otherwise(0L)).as("n_unseen"),
        (sum(col("tf") * col("surprisal")).cast("double") /
          sum("tf").cast("double")).as("bits_per_bigram"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        col("bits_per_bigram"))
  }

  /** One-row corpus health report — the summary a curation run logs
    * before and after each stage: document count, exact-duplicate
    * count (docs minus distinct text fingerprints), token-instance
    * total, vocabulary size, tokenless-document count, and the max /
    * mean document length in tokens (mean over token-bearing docs).
    *
    * Scale shape: the token-side stats ride one [[termFreq]] pass
    * (per-doc collapse map-side, then two tiny aggregates); the
    * fingerprint stats are a second scan aggregating md5 projections.
    * Every intermediate is a one-row frame joined by broadcast — no
    * driver collect. */
  def corpusReport(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val perDoc = tf.groupBy(col(idCol)).agg(sum("tf").as("doc_tokens"))
    val tokSide = perDoc.agg(
      sum("doc_tokens").as("n_token_instances"),
      max("doc_tokens").as("max_doc_tokens"),
      count(lit(1)).as("n_token_docs"))
    val vocabSide = tf.select(col("token")).distinct()
      .agg(count(lit(1)).as("vocab_size"))
    val docSide = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col(textCol))).as("n_distinct_texts"))
    docSide.crossJoin(broadcast(tokSide)).crossJoin(broadcast(vocabSide))
      .select(
        col("n_docs"),
        (col("n_docs") - col("n_distinct_texts")).as("n_exact_dups"),
        coalesce(col("n_token_instances"), lit(0L)).as("n_token_instances"),
        col("vocab_size"),
        (col("n_docs") - coalesce(col("n_token_docs"), lit(0L)))
          .as("n_tokenless_docs"),
        coalesce(col("max_doc_tokens"), lit(0L)).as("max_doc_tokens"),
        (coalesce(col("n_token_instances"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_token_docs"), lit(0L)), lit(1L))
            .cast("double"))
          .as("mean_doc_tokens"))
  }

  /** Top-`k` TF-IDF terms per document, IDF as the integer bit-gap
    * `bitLen(N) − bitLen(df)` (≈ log2(N/df) within 1 bit; a token in
    * more than half the documents scores 0 and ranks last, exactly the
    * stopword-suppression IDF exists for). Rank ties break by token so
    * the cut is total-ordered and replayable. Documents with no tokens
    * have no rows (there is no term to rank).
    *
    * The tf⋈df join keys on `token`: df is vocabulary-sized, so Spark
    * broadcasts it at test scale; at lake scale it degrades to a
    * shuffle of per-document DISTINCT terms (already collapsed by
    * [[termFreq]]), never raw instances.
    */
  def tfIdfTopK(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", k: Int = 5): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val dfFrame = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("token").asc)
    tf.join(dfFrame, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * (bitLen(col("n_docs")) - bitLen(col("df"))).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("tf"), col("df"),
        col("score"))
  }
}
