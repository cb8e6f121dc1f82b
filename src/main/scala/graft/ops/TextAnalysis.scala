package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions

/** Text-analysis operators for the training-data surface (builder brief):
  * language ID, quality scoring, token counting, fingerprinting — all
  * pure column expressions (codegen'd, no UDFs), so they run inside
  * whole-stage codegen over the scan at any scale.
  *
  * The reference has no text ops (its only string work is S3 key
  * handling, SURVEY.md §2.G); these extend the engine for corpus
  * preparation over the `documents` table.
  */
object TextAnalysis {

  /** Whitespace tokenization, lowercased. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** [[tokens]] with empty strings dropped (a blank document tokenizes
    * to `[""]`; most corpus ops want `[]`). THE tokenize-and-filter
    * contract the DuckDB oracles replay as
    * `list_filter(regexp_split_to_array(LOWER(TRIM(text)), '\s+'),
    * x -> LENGTH(x) > 0)` — one definition so engine and oracle can
    * never drift apart per call site. */
  def nonEmptyTokens(text: Column): Column =
    filter(tokens(text), t => length(t) > 0)

  /** Exact whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-count estimate: word-pieces ≈ alnum runs plus
    * punctuation marks, each ~4 chars of a word becoming one piece —
    * a cheap regex proxy for tokenizer budgeting (no tokenizer libs in
    * this container). */
  def tokenCountBpe(text: Column): Column = {
    val cc = GraftExpressions.char_class_stats(text)
    // pieces = non-empty [\p{L}\p{N}]+ runs; punct = the complement
    // class count; extra piece per run longer than 4 code points —
    // exactly the original filter(split)/regexp_replace composition,
    // now one code-point pass (see [[GraftExpressions.CharClassStats]])
    (element_at(cc, 6) + element_at(cc, 4) + element_at(cc, 7))
      .as("token_count_bpe")
  }

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "que", "por"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "für"))

  private val langOrder = Seq("en", "fr", "es", "de")

  /** The shared stopword-profile expression: `[n_tokens, score_en,
    * score_fr, score_es, score_de, union_hits]` in one tokenize pass.
    * langId and qualityScore build the IDENTICAL expression tree, so
    * when both land in one projection (the curation single-scan)
    * whole-stage codegen's subexpression elimination computes it once
    * per row. The per-set `size(filter(toks, isInCollection))` stack it
    * replaces re-split the text once per set, interpreted (5× per row
    * across the two callers). */
  private def swStats(text: Column): Column =
    GraftExpressions.stopword_stats(text,
      langOrder.map(stopwords) :+ stopwords.values.flatten.toSeq.distinct)

  /** Heuristic language ID: argmax of per-language stopword density, with
    * a CJK-character-ratio gate for zh. Deterministic; ties break by the
    * fixed language order. Emits `lang_pred` plus the per-language scores
    * (useful for threshold tuning downstream). */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val sw = swStats(col(textCol))
    val cc = GraftExpressions.char_class_stats(col(textCol))
    val scored = df
      .withColumn("score_en", element_at(sw, 2))
      .withColumn("score_fr", element_at(sw, 3))
      .withColumn("score_es", element_at(sw, 4))
      .withColumn("score_de", element_at(sw, 5))
      .withColumn("cjk_ratio",
        element_at(cc, 5).cast("double") /
          greatest(element_at(cc, 1), lit(1)).cast("double"))
    val best = greatest(col("score_en"), col("score_fr"), col("score_es"), col("score_de"))
    scored.withColumn("lang_pred",
      when(col("cjk_ratio") > 0.3, "zh")
        .when(best === 0, "und")
        .when(col("score_en") === best, "en")
        .when(col("score_fr") === best, "fr")
        .when(col("score_es") === best, "es")
        .otherwise("de"))
  }

  /** Document quality score ∈ [0,1]: blend of length adequacy, alphabetic
    * ratio, mean-word-length sanity, and stopword presence — the standard
    * cheap pre-filter shape for corpus cleaning. Pure arithmetic over
    * codegen'd functions; fully deterministic. */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val cc = GraftExpressions.char_class_stats(text)
    val sw = swStats(text)
    val len = element_at(cc, 1).cast("double")
    val alpha = element_at(cc, 2).cast("double")
    val nToks = greatest(element_at(sw, 1), lit(1)).cast("double")
    val meanWordLen = alpha / nToks
    val stopHits = element_at(sw, 6).cast("double")
    df.withColumn("len_score", least(len / 200.0, lit(1.0)))
      .withColumn("alpha_ratio", alpha / greatest(len, lit(1.0)))
      .withColumn("word_len_score",
        when(meanWordLen.between(3.0, 10.0), 1.0).otherwise(0.5))
      .withColumn("stopword_ratio", least(stopHits / nToks * 5.0, lit(1.0)))
      .withColumn("quality_score",
        bround(col("len_score") * 0.3 + col("alpha_ratio") * 0.3 +
          col("word_len_score") * 0.2 + col("stopword_ratio") * 0.2, 4))
  }

  /** Gopher/MassiveText rule filter (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * §A.1.1): the published per-document quality gate as explicit
    * per-rule booleans plus the conjunction `gopher_kept` — reasons
    * stay inspectable, unlike [[qualityScore]]'s blended scalar (the
    * two compose: score for ranking, rules for the hard gate).
    *
    * Rules (thresholds verbatim from the paper):
    *  - `r_word_count`: 50 ≤ words ≤ 100,000;
    *  - `r_mean_word_len`: mean token length in [3, 10];
    *  - `r_symbol_ratio`: '#' per word ≤ 0.1 AND ellipsis ("..." or
    *    "…") per word ≤ 0.1;
    *  - `r_bullet_lines`: ≤ 90% of lines start with a bullet
    *    (-, *, •);
    *  - `r_ellipsis_lines`: ≤ 30% of lines end with an ellipsis;
    *  - `r_alpha_words`: ≥ 80% of words contain a letter;
    *  - `r_stopwords`: ≥ 2 hits from the paper's 8-word list (the, be,
    *    to, of, and, that, have, with);
    *  - `r_dup_lines`: duplicate-line fraction ≤ 0.30 AND
    *    duplicate-line CHARACTER fraction ≤ 0.20 (both repetition
    *    signals from the paper's Table A1; the n-gram repetition
    *    variants live in [[dupNgramFraction]]).
    *
    * Everything is array/HOF arithmetic over one scan of the text —
    * no shuffle, no UDF; ratios are small-integer divisions, so the
    * booleans are engine-stable and the whole frame replays in the
    * DuckDB oracle. */
  def gopherRules(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val toks = nonEmptyTokens(text)
    val nw = size(toks).cast("double")
    val nwSafe = greatest(nw, lit(1.0))
    val sumTokLen = aggregate(toks, lit(0), (a, t) => a + length(t))
    val meanWordLen = sumTokLen.cast("double") / nwSafe
    val nHash = length(text) - length(replace(text, lit("#")))
    val nEllipsis = (length(text) - length(replace(text, lit("...")))) / 3 +
      (length(text) - length(replace(text, lit("…"))))
    val alphaWords = size(filter(toks, t => t.rlike("\\p{L}")))
    val stop8 = size(filter(toks, t => t.isInCollection(
      Seq("the", "be", "to", "of", "and", "that", "have", "with"))))
    val lines = split(text, "\n")
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val trimmed = transform(lines, l => trim(l))
    val bulletLines = size(filter(trimmed, l =>
      substring(l, 1, 1).isin("-", "*", "•")))
    val ellipsisLines = size(filter(trimmed, l =>
      l.endsWith("...") || l.endsWith("…")))
    val lineChars = aggregate(lines, lit(0), (a, l) => a + length(l))
    val distinctLineChars =
      aggregate(array_distinct(lines), lit(0), (a, l) => a + length(l))
    val dupLineFrac =
      (size(lines) - size(array_distinct(lines))).cast("double") / nLines
    val dupCharFrac = (lineChars - distinctLineChars).cast("double") /
      greatest(lineChars, lit(1)).cast("double")

    df.withColumn("r_word_count", nw.between(50.0, 100000.0))
      .withColumn("r_mean_word_len", meanWordLen.between(3.0, 10.0))
      .withColumn("r_symbol_ratio",
        nHash.cast("double") / nwSafe <= 0.1 &&
          nEllipsis.cast("double") / nwSafe <= 0.1)
      .withColumn("r_bullet_lines",
        bulletLines.cast("double") / nLines <= 0.9)
      .withColumn("r_ellipsis_lines",
        ellipsisLines.cast("double") / nLines <= 0.3)
      .withColumn("r_alpha_words", alphaWords.cast("double") / nwSafe >= 0.8)
      .withColumn("r_stopwords", stop8 >= 2)
      .withColumn("r_dup_lines", dupLineFrac <= 0.3 && dupCharFrac <= 0.2)
      .withColumn("gopher_kept",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_symbol_ratio") && col("r_bullet_lines") &&
          col("r_ellipsis_lines") && col("r_alpha_words") &&
          col("r_stopwords") && col("r_dup_lines"))
  }

  /** Normalized-text fingerprints: md5 (content-addressable id, matches
    * DuckDB's md5 for the oracle) and the rolling Karp–Rabin hash (custom
    * expression — cheap shingling primitive). */
  def fingerprints(df: DataFrame, textCol: String = "text"): DataFrame = {
    val norm = lower(regexp_replace(trim(col(textCol)), "\\s+", " "))
    df.withColumn("fp_md5", md5(norm))
      .withColumn("fp_rolling", GraftExpressions.rolling_hash64(norm))
  }

  /** Repeated n-gram fraction (the Gopher/MassiveText-style repetition
    * signal: Rae et al. 2021, §A.1.1): of all n-gram occurrences in the
    * document, the fraction that are repeats of an earlier occurrence —
    * high values flag boilerplate/spam. Pure array expressions over one
    * scan; exact small-int ratio, so the double division is
    * engine-stable. */
  def dupNgramFraction(df: DataFrame, n: Int = 3,
                       textCol: String = "text"): DataFrame = {
    val sh = Dedup.shingles(col(textCol), n)
    df.withColumn("n_ngrams", size(sh))
      .withColumn("n_distinct_ngrams", size(array_distinct(sh)))
      .withColumn("dup_ngram_frac",
        (col("n_ngrams") - col("n_distinct_ngrams")).cast("double") /
          greatest(col("n_ngrams"), lit(1)).cast("double"))
  }

  /** PII redaction: masks email addresses and long digit runs (phone-ish)
    * with typed placeholders, and counts what it masked (the audit
    * columns a scrubbing pipeline reports). The regexes stay in the
    * RE2-compatible subset, so they behave identically in Java and in
    * the DuckDB oracle. */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "[0-9][0-9 ()+-]{6,}[0-9]"
    val t = col(textCol)
    df.withColumn("n_emails",
        size(regexp_extract_all(t, lit(email), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(regexp_replace(t, email, "<EMAIL>"),
          lit(phone), lit(0))))
      .withColumn("text_redacted",
        regexp_replace(regexp_replace(t, email, "<EMAIL>"), phone, "<PHONE>"))
  }

  /** Benchmark-contamination screen: for each corpus document, the
    * fraction of its distinct n-gram shingles that also occur in the
    * benchmark set (the n-gram-overlap decontamination test of
    * GPT-3/PaLM-style training pipelines). The benchmark shingle set is
    * small by construction (eval sets are KBs against a 100 TB corpus):
    * it is collected once on the driver and shipped inside a single
    * native membership expression
    * ([[GraftExpressions.ShingleOverlapCount]]), so the whole measure is
    * a PROJECTION in the corpus scan — no explode, no join, no
    * aggregation, zero shuffle. (The previous explode→broadcast-join→
    * groupBy shape materialized one row per (doc, shingle) and
    * re-aggregated by id: 4.8 s at sf0.1 for what one fused loop does in
    * a scan pass. Same exact string-membership semantics as the SQL
    * equi-join oracle.) Docs with no shingles are omitted, matching the
    * explode form's semantics. */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    n: Int = 3, maxShingles: Int = 1000000): DataFrame = {
    // LOUD size guard (the lookupAll capped-probe contract): the
    // benchmark shingle set ships to every task as an expression
    // constant, so a consolidated 10^7-10^8-shingle decontamination
    // list would OOM the driver and bloat every task binary before any
    // correctness problem surfaced. The collect is bounded to cap+1
    // rows, so even probing an oversized set cannot OOM the check
    // itself.
    val benchShingles: Array[String] =
      benchmark.select(explode(array_distinct(Dedup.shingles(col(textCol), n)))
          .as("shingle")).distinct()
        .limit(maxShingles + 1)
        .collect().map(_.getString(0))
    if (benchShingles.length > maxShingles)
      throw new IllegalArgumentException(
        s"benchmark set has more than $maxShingles distinct $n-shingles — " +
          "too large to embed as an expression constant; use " +
          "contaminationBloom (distributed sketch build + exact verify " +
          "of hits), which computes the same result at any benchmark size")
    val sh = array_distinct(Dedup.shingles(col(textCol), n))
    corpus
      .select(col(idCol),
        size(sh).cast("long").as("n_shingles"),
        GraftExpressions.shingle_overlap_count(sh, benchShingles)
          .as("n_contaminated"))
      .filter(col("n_shingles") > 0)
      .withColumn("contamination_frac",
        col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
  }

  /** [[contamination]] for benchmark sets too large to ship as an
    * expression constant: a consolidated decontamination list (every
    * eval + held-out set, 10⁷–10⁸ shingles at lake scale) stops fitting
    * in [[GraftExpressions.ShingleOverlapCount]]'s embedded string set
    * long before the corpus scan stops being the bottleneck. Exact
    * result — same schema, same values, same oracle as
    * [[contamination]] — in three stages:
    *
    *  1. BUILD (distributed): benchmark → distinct shingles → a
    *     `spark.util.sketch.BloomFilter` merged up a `treeAggregate`
    *     (executors each fold their partitions, driver holds only the
    *     final few-MB sketch, never the shingle set).
    *  2. PROBE (scan pass, zero shuffle):
    *     [[GraftExpressions.BloomMightContainCount]] counts per-doc
    *     might-contain hits. A Bloom miss is DEFINITIVE, so
    *     `hits == 0` proves the document clean with no join — at
    *     realistic contamination rates that is almost the whole corpus
    *     (false-positive share bounded by `fpp` per shingle).
    *  3. VERIFY (exact, hit docs only): bloom-hit documents explode
    *     their shingles into a left join against the benchmark shingle
    *     frame — the exchange carries only the hit docs' shingles
    *     (~`fpp`·corpus + true contamination), and Spark picks the join
    *     strategy from the benchmark side's real size (no broadcast
    *     assumption). False positives come back with count 0, restoring
    *     exactness.
    *
    * The benchmark derivation is evaluated twice eagerly (count for the
    * sketch's `expectedNumItems`, then the build) plus once lazily in
    * the verify join — all on the SMALL side; persist `benchmark`
    * upstream if that matters. */
  def contaminationBloom(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         n: Int = 3, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.util.sketch.BloomFilter
    val benchSh = benchmark
      .select(explode(array_distinct(Dedup.shingles(col(textCol), n))).as("shingle"))
      .distinct()
    val nItems = math.max(benchSh.count(), 1L)
    val bloom = benchSh.rdd.map(_.getString(0))
      .treeAggregate(BloomFilter.create(nItems, fpp))(
        (f, s) => { f.putBinary(s.getBytes("UTF-8")); f },
        (a, b) => a.mergeInPlace(b))
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val sh = array_distinct(Dedup.shingles(col(textCol), n))
    val probed = corpus
      .select(col(idCol), sh.as("_sh"))
      .withColumn("n_shingles", size(col("_sh")).cast("long"))
      .filter(col("n_shingles") > 0)
      .withColumn("_hits", GraftExpressions.bloom_might_contain_count(col("_sh"), bytes))
    val clean = probed.filter(col("_hits") === 0)
      .select(col(idCol), col("n_shingles"), lit(0L).as("n_contaminated"))
    val verified = probed.filter(col("_hits") > 0)
      .select(col(idCol), col("n_shingles"), explode(col("_sh")).as("shingle"))
      .join(benchSh.withColumn("_bench", lit(1)), Seq("shingle"), "left")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(sum(coalesce(col("_bench"), lit(0))).cast("long").as("n_contaminated"))
    clean.unionByName(verified)
      .withColumn("contamination_frac",
        col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
  }

  /** C4-style line-level dedup (Raffel et al. 2020, §2.2: drop any
    * three-sentence span occurring more than once in the corpus;
    * RefinedWeb/Gopher run the same pass per LINE). The corpus here is
    * single-line word streams, so the dedup unit is a fixed `segWords`-word
    * segment — the same dataflow, deterministic segmentation.
    *
    * Scale design — document text never rides a shuffle:
    *  1. segment in the scan pass (posexplode is a projection, not an
    *     exchange) and fingerprint each segment (md5 — 16 bytes);
    *  2. global frequency = two-stage groupBy over (fp, doc_id) then fp —
    *     every exchange moves fingerprints, not text;
    *  3. the frequent set (`>= minDocs` distinct docs) is the boilerplate
    *     tail — bounded above by total_segs/minDocs and in practice tiny,
    *     the same degenerate-key argument as [[Dedup.DefaultMaxBucketSize]]
    *     — so the anti-join against the positional (doc_id, seg_idx, fp)
    *     frame broadcasts it;
    *  4. surviving segment INDEXES (an int list per doc) join back to the
    *     corpus and the cleaned text is rebuilt from the doc's own token
    *     array in a projection. With the corpus bucketed on the id
    *     ([[Layout.writeBucketed]]) that join is exchange-free too.
    *
    * The rebuild is O(segs): the segment array is materialized ONCE as a
    * column, kept indexes are sorted (collect_list order is not
    * shuffle-stable) and each index is an O(1) `element_at` into the
    * bound array. (The previous `filter(segs, array_contains(kept_idx))`
    * shape was O(segs²) twice over — a linear `array_contains` probe per
    * segment, AND the un-materialized `segs` expression tree re-evaluated
    * per lambda element — which a single 10 MB document, ~700k segments,
    * turns into a straggler task.)
    *
    * Returns one row per doc: n_segs, n_removed, text_clean. */
  def lineDedup(df: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", segWords: Int = 3,
                minDocs: Int = 3): DataFrame = {
    // Linear single-pass segmentation: normalize whitespace runs to one
    // space, mark every segWords-th word boundary with a U+001E sentinel
    // (one regex pass — each match consumes segWords words, so the scan
    // never revisits input), split once on the sentinel. The obvious
    // `transform(sequence(0, nSegs-1), i => concat_ws(slice(words, ...)))`
    // shape is O(segs²): higher-order functions evaluate interpreted, so
    // the lambda re-evaluates the full `split(text)` subtree PER ELEMENT
    // — a single 300k-word document turns that into hours, measured. The
    // sentinel is a non-whitespace control char, so a document containing
    // a literal U+001E inside a word would over-split that word's
    // segment; acceptable for whitespace-delimited text corpora.
    val rs = "\u001E"
    val segs = split(
      regexp_replace(
        regexp_replace(trim(col(textCol)), "\\s+", " "),
        s"((?:\\S+ ){${segWords - 1}}\\S+) ", s"$$1$rs"),
      rs)
    val pos = df.select(col(idCol),
        posexplode(segs).as(Seq("seg_idx", "seg")))
      .select(col(idCol), col("seg_idx"), md5(col("seg")).as("fp"))
    val frequent = pos.select(col("fp"), col(idCol)).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("fp"))
    val keptIdx = pos.join(broadcast(frequent), Seq("fp"), "left_anti")
      .groupBy(col(idCol))
      .agg(collect_list(col("seg_idx")).as("kept_idx"))
    df.withColumn("_segs", segs)
      .join(keptIdx, Seq(idCol), "left")
      .select(col(idCol),
        size(col("_segs")).as("n_segs"),
        (size(col("_segs")) - coalesce(size(col("kept_idx")), lit(0)))
          .as("n_removed"),
        concat_ws(" ",
          transform(
            array_sort(coalesce(col("kept_idx"),
              array().cast("array<int>"))),
            i => element_at(col("_segs"), i + 1)))
          .as("text_clean"))
  }

  /** Full document-statistics projection (token counts exact + BPE-ish,
    * char classes, quality) — one pass, one scan. */
  def docStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val cc = GraftExpressions.char_class_stats(text)
    df.withColumn("n_len", element_at(cc, 1))
      .withColumn("n_tokens", tokenCount(text))
      .withColumn("n_alpha", element_at(cc, 2))
      .withColumn("n_digits", element_at(cc, 3))
      .withColumn("n_punct", element_at(cc, 4))
  }
}
