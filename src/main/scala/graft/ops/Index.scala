package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pruned inverted index: token → document frequency + a bounded,
  * sorted posting list of document ids. The lookup artifact behind
  * fast decontamination and membership probes — "which documents
  * contain this benchmark phrase?" answered by an index seek instead
  * of a corpus scan (the same reason [[TextAnalysis.contamination]]'s
  * broadcast semi-join exists; the index is its precomputed inverse).
  *
  * Pruning is load-bearing at scale, not an option:
  *  - `maxDfFrac` drops stopword tokens — a token in more than that
  *    fraction of documents carries no lookup value and its posting
  *    list is corpus-sized (the classic inverted-index stopword cliff);
  *  - `minDf` drops hapax noise (misspellings, ids) that bloats the
  *    vocabulary without ever being queried;
  *  - `maxPostings` bounds every surviving list by RANKING postings
  *    (window over the token, ordered by doc id) and filtering BEFORE
  *    the list is aggregated — the aggregation buffer never holds more
  *    than the cap, where a collect-then-slice shape would materialize
  *    the full unbounded list first.
  *
  * Scale shape: one exchange. The window partitions by token; document
  * frequency, the posting rank, and the final `collect_list` all reuse
  * that same hash partitioning (the group-by keys the exchange the
  * window already made), and what shuffles is bare (token, doc_id)
  * pairs — [[CorpusStats.termFreq]] collapsed each document's repeats
  * map-side. `sort_array` makes the list order deterministic
  * regardless of task arrival order.
  */
object Index {

  /** Build the pruned postings table: `(token, df, postings)`, where
    * `df` is the token's FULL document frequency (pre-cap — the stat a
    * query planner wants) and `postings` the first `maxPostings` doc
    * ids in ascending order. */
  def postings(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text", minDf: Long = 2L,
               maxDfFrac: Double = 0.5,
               maxPostings: Int = 100): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1: $minDf")
    require(maxDfFrac > 0 && maxDfFrac <= 1, s"maxDfFrac out of (0,1]: $maxDfFrac")
    require(maxPostings >= 1, s"maxPostings must be >= 1: $maxPostings")
    val pairs = CorpusStats.termFreq(docs, idCol, textCol)
      .select(col("token"), col(idCol))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val byToken = Window.partitionBy(col("token"))
    val ranked = pairs
      .withColumn("df", count(lit(1)).over(byToken))
      .withColumn("rk",
        row_number().over(byToken.orderBy(col(idCol).asc)))
      .crossJoin(broadcast(nDocs))
      // floor(n_docs * frac) as the stopword ceiling: exact integer
      // arithmetic so the DuckDB oracle replays the cut bit-for-bit
      .filter(col("df") >= minDf &&
        col("df") <= floor(col("n_docs") * lit(maxDfFrac)).cast("long") &&
        col("rk") <= maxPostings)
    ranked.groupBy(col("token"))
      .agg(max(col("df")).as("df"),
        sort_array(collect_list(col(idCol))).as("postings"))
  }

  /** Positional postings: `(token, doc_id, positions)` with the
    * 0-based token offsets of every occurrence, ascending — the layer
    * under EXACT-PHRASE probes ([[lookupPhrase]]), where the flat
    * index's conjunctive membership over-matches ("new york" vs "york
    * new"). Pruning mirrors [[postings]]: `minDf` floor and `maxDfFrac`
    * stopword ceiling on DOCUMENT frequency; within a surviving
    * (token, doc) pair the positions list is complete (a capped
    * positions list would turn phrase probes into silent false
    * negatives — the failure mode this index exists to avoid — so
    * boundedness comes from the df pruning, not a per-list cap).
    *
    * Scale shape: one (token, doc)-keyed aggregate builds the position
    * lists from bare (token, doc, pos) triples (map-side combine
    * collapses each document's occurrences before the exchange); the
    * df prune is a window count over the SAME token-side partitioning.
    * Document bodies never shuffle. */
  def positionalPostings(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text", minDf: Long = 1L,
                         maxDfFrac: Double = 0.8): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1: $minDf")
    require(maxDfFrac > 0 && maxDfFrac <= 1, s"maxDfFrac out of (0,1]: $maxDfFrac")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val occ = graft.io.Sources.fanOut(docs, idCol)
      .select(col(idCol),
        posexplode(TextAnalysis.nonEmptyTokens(col(textCol)))
          .as(Seq("pos", "token")))
    val perDoc = occ.groupBy(col("token"), col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
    val byToken = Window.partitionBy(col("token"))
    perDoc
      .withColumn("df", count(lit(1)).over(byToken))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= minDf &&
        col("df") <= floor(col("n_docs") * lit(maxDfFrac)).cast("long"))
      .select(col("token"), col(idCol), col("df"), col("positions"))
  }

  /** Exact-phrase probe over [[positionalPostings]]: ids of documents
    * containing the probe tokens CONSECUTIVELY, in order. For each
    * document holding every phrase token, the occurrence positions of
    * token i are shifted by −i and intersected — a surviving shifted
    * position is a phrase start. Tokens missing from the pruned index
    * match nothing (same ambiguity contract as [[lookupAll]]: an
    * exhaustive screen builds the index with `minDf = 1` and a
    * ceiling above every probe token's df).
    *
    * The probe is tiny and broadcast as literals; per candidate
    * document the work is an array intersection over its own
    * occurrence lists — never a corpus scan. */
  def lookupPhrase(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    // positionalPostings output shape: (token, idCol, df, positions)
    val idCol = index.columns(1)
    val hits = phrase.zipWithIndex.map { case (tok, i) =>
      index.filter(col("token") === tok)
        .select(col(idCol),
          transform(col("positions"), p => p - i).as(s"shift_$i"))
    }
    val joined = phrase.indices.tail.foldLeft(
      hits.head.select(col(idCol), col("shift_0").as("starts"))) {
      case (acc, i) =>
        acc.join(hits(i), Seq(idCol))
          .withColumn("starts",
            array_intersect(col("starts"), col(s"shift_$i")))
          .drop(s"shift_$i")
    }
    joined.filter(size(col("starts")) > 0).select(col(idCol))
  }

  /** Probe the index: ids of documents containing EVERY probe token
    * (conjunctive membership — the decontamination lookup).
    *
    * A token absent from the index matches nothing — and an index-side
    * ABSENCE is ambiguous: the token may occur in zero documents, or
    * it may have been pruned by `minDf`/`maxDfFrac` while occurring in
    * real documents. The two cases are indistinguishable from the
    * index alone, so a screen that must not miss rare probes has to be
    * built with `minDf = 1` (and a `maxDfFrac` above every probe
    * token's df); the defaults exist for planner-style lookups, not
    * exhaustive screens.
    *
    * A probe token whose posting list was CAPPED (`df` exceeds the
    * stored list length) cannot answer membership for the documents
    * past the cap — silently treating it like an uncapped list would
    * return false negatives, the one failure mode a decontamination
    * screen must not have. The probe FAILS LOUDLY on such a token:
    * build the index with `maxPostings` ≥ the maximum `df` you intend
    * to probe (cap-free screens), or pre-drop high-df probe tokens the
    * way the stopword ceiling already does for the index side.
    *
    * The probe list is tiny and broadcast; the index is never scanned
    * more than once. */
  def lookupAll(index: DataFrame, probeTokens: Seq[String]): DataFrame = {
    require(probeTokens.nonEmpty, "empty probe")
    val probes = probeTokens.distinct
    val hit = index.filter(col("token").isin(probes: _*)).persist()
    try {
      val capped = hit
        .filter(col("df") > size(col("postings")).cast("long"))
        .select(col("token")).limit(5)
        .collect().map(_.getString(0))
      require(capped.isEmpty,
        s"probe tokens with capped posting lists (membership undecidable " +
          s"past the cap): ${capped.mkString(", ")}")
      Dedup.materializeThenUnpersist(
        hit.select(explode(col("postings")).as("doc_id"), col("token"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_hit"))
          .filter(col("n_hit") === probes.size)
          .select(col("doc_id")),
        hit)
    } catch { case e: Throwable => hit.unpersist(); throw e }
  }
}
