package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composed document-curation pipeline — the end-to-end shape a
  * training-data preparation run takes, built entirely from the
  * already-oracled primitives of this library:
  *
  *   1. language gate      — [[TextAnalysis.langId]] prediction == `lang`
  *   2. quality gate       — [[TextAnalysis.qualityScore]] >= `minQuality`
  *   3. exact dedup        — min-doc-id wins per md5(text) fingerprint,
  *                           among gate survivors
  *   4. near-dup drop      — [[Dedup.minhashPairs]] (KR signatures,
  *                           16×4 LSH banding) at `jaccard`; for every
  *                           surviving pair (a, b) with a < b, b drops
  *                           (min-id-wins pair rule — deliberately NOT
  *                           transitive clustering: it is one join
  *                           against the pair list, replayable in SQL,
  *                           where clustering would be an iterative
  *                           fixpoint; [[Dedup.nearDupClusters]] exists
  *                           when transitive semantics are wanted)
  *   5. contamination gate — [[TextAnalysis.contamination]] distinct-
  *                           shingle overlap vs the benchmark set
  *                           <= `maxContamination`
  *
  * Each stage evaluates ONLY the survivors of the previous stages (so
  * e.g. a near-dup pair between two low-quality docs costs nothing and
  * drops nobody), except the contamination screen, which is a per-doc
  * measure against a FIXED benchmark set and therefore commutes with
  * every other stage — it is computed corpus-wide and applied last.
  *
  * Output: one row per input document with the per-doc evidence
  * (`lang_pred`, `quality_score`, `contamination_frac`) and the verdict:
  * `drop_stage` = first stage that rejected it (NULL if kept), and
  * `kept`. A funnel summary is one `groupBy(drop_stage)` away.
  *
  * Scale shape (the point of composing it this way): stages 1–2 and the
  * per-doc contamination measure are pure column expressions inside the
  * corpus scan (no shuffle; the benchmark shingle set is broadcast);
  * stages 3–4 compute SMALL drop-lists over projected columns —
  * (id, fp) pairs for exact, (id, band, bucket) triples for LSH — and
  * the final assembly is left-joins of those drop-lists back onto the
  * flagged scan by id. Document bodies are never shuffled anywhere.
  *
  * The reference pipeline has no corpus surface (SURVEY.md §2.G); this
  * is the training-data extension of its validate→transform→publish
  * composition shape (`/root/reference/Task_1/task_1.py:106-141`).
  */
object Curation {

  /** Stage names in `drop_stage`, in evaluation order. */
  val Stages: Seq[String] =
    Seq("lang", "quality", "exact", "near_dup", "contamination")

  /** Run the full pipeline. `benchmark` is the decontamination reference
    * set (eval-set documents — KBs against a lake-scale corpus, so its
    * shingle set broadcasts).
    *
    * Scan accounting (round 7 — the previous shape re-derived the
    * lang/quality regex columns in every branch that gated on them, so
    * the corpus text was read and the flag expressions recomputed 4×):
    * ONE scan now computes every per-doc scalar the stages need — lang
    * and quality flags, the md5 fingerprint, AND the minhash signature —
    * into a persisted frame of per-doc scalars (~600 B/doc: two strings,
    * two flags, a 64-int signature; spillable, and the corpus's reusable
    * artifact at lake scale — the same thing [[Dedup.writeSignatures]]
    * materializes). Every stage then works off that frame; the only
    * other text read is the contamination measure's own scan (inherent —
    * its shingle explode is a different grain). Signatures are computed
    * for ALL docs rather than only gate survivors: at 100 TB the extra
    * signature arithmetic on gate-failures is far cheaper than the
    * second full text read + regex recompute the survivor-only shape
    * pays (IO-bound scans dominate), and the full signature table is
    * what incremental ingest wants anyway. The result is materialized
    * while the cache is hot and the cache released
    * ([[Dedup.materializeThenUnpersist]]), so back-to-back runs don't
    * accumulate block-manager state.
    *
    * The two LAKE-SCALE knobs (defaults preserve the oracle-checked
    * small-SF semantics exactly):
    *  - `maxBucketSize` flows into the stage-4 banded self-join
    *    ([[Dedup.DefaultMaxBucketSize]] by default). A boilerplate-heavy
    *    corpus (the kind with 100k-copy template cliques) needs a LOWER
    *    cap so degenerate buckets drop wholesale before any pair forms —
    *    the same rationale as [[Dedup.minhashPairs]]'s cap doc.
    *  - `bloomContamination = true` routes stage 5 through
    *    [[TextAnalysis.contaminationBloom]] — same schema, same values,
    *    same oracle, but the benchmark shingle set is built as a
    *    distributed Bloom sketch instead of a driver-collected expression
    *    constant, which [[TextAnalysis.contamination]]'s `maxShingles`
    *    guard refuses (loudly) once a consolidated decontamination list
    *    passes ~10⁶ distinct shingles. */
  def curate(docs: DataFrame, benchmark: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             lang: String = "en", minQuality: Double = 0.65,
             jaccard: Double = 0.4,
             maxContamination: Double = 0.2,
             maxBucketSize: Int = Dedup.DefaultMaxBucketSize,
             bloomContamination: Boolean = false): DataFrame = {
    val id = col(idCol)

    // the single corpus scan: stages 1-4's per-doc scalars in one pass
    val perDoc = TextAnalysis.qualityScore(
        TextAnalysis.langId(graft.io.Sources.fanOut(docs, idCol), textCol), textCol)
      .select(id, col("lang_pred"), col("quality_score"),
        md5(col(textCol)).as("fp"),
        Dedup.minhashSignature(Dedup.shingles(col(textCol), 3), 64).as("sig"))
      .withColumn("lang_ok", col("lang_pred") === lang)
      .withColumn("quality_ok", col("quality_score") >= minQuality)
      .persist()
    val surv2 = perDoc.filter(col("lang_ok") && col("quality_ok"))

    // stage 3: exact-dup drop-list over (id, fp) projections only —
    // partial-agg min per fingerprint, then the losers' ids
    val ids2 = surv2.select(id, col("fp"))
    val dropExact = ids2
      .join(ids2.groupBy(col("fp")).agg(min(id).as("keep_id")), Seq("fp"))
      .filter(id =!= col("keep_id"))
      .select(id)
      .withColumn("exact_dup", lit(true))

    // stage 4: near-dup drop-list among stage-3 survivors — banded
    // self-join over the already-computed signatures, bodies never read
    val surv3Sigs = surv2.join(dropExact.select(id), Seq(idCol), "left_anti")
      .select(id, col("sig"))
    val dropNear = Dedup.minhashPairsFromSigs(surv3Sigs, idCol,
        threshold = jaccard, maxBucketSize = maxBucketSize)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("near_dup", lit(true))

    // stage 5 measure: corpus-wide per-doc contamination vs the fixed
    // benchmark (commutes with the other stages; see class doc)
    val contam =
      (if (bloomContamination)
         TextAnalysis.contaminationBloom(docs, benchmark, idCol, textCol)
       else TextAnalysis.contamination(docs, benchmark, idCol, textCol))
        .select(id, col("contamination_frac"))

    val out = perDoc
      .join(dropExact, Seq(idCol), "left")
      .join(dropNear, Seq(idCol), "left")
      .join(contam, Seq(idCol), "left")
      .withColumn("drop_stage",
        when(!col("lang_ok"), "lang")
          .when(!col("quality_ok"), "quality")
          .when(col("exact_dup"), "exact")
          .when(col("near_dup"), "near_dup")
          .when(col("contamination_frac") > maxContamination, "contamination"))
      .withColumn("kept", col("drop_stage").isNull)
      .select(id, col("lang_pred"), col("quality_score"),
        col("contamination_frac"), col("drop_stage"), col("kept"))
    Dedup.materializeThenUnpersist(out, perDoc)
  }

  /** Per-stage funnel: how many documents each stage rejected, plus the
    * `kept` remainder — the audit table a curation run publishes. */
  def funnel(curated: DataFrame): DataFrame =
    curated
      .groupBy(coalesce(col("drop_stage"), lit("kept")).as("stage"))
      .agg(count(lit(1)).as("n_docs"))

  /** Keep the top `frac` of documents by a score column, EXACTLY (no
    * approximate quantiles): a document survives iff fewer than
    * `K = floor(frac · N)` documents score strictly higher — i.e. its
    * dense-competition RANK is ≤ K. Ties at the boundary are all kept
    * (tie-inclusive, so the kept count can exceed K by the boundary tie
    * group; the deterministic alternative — dropping an arbitrary
    * subset of equals — is worse for reproducibility).
    *
    * Scale shape: no global sort and no global window over the corpus.
    * The score HISTOGRAM (one hash aggregate, cardinality = distinct
    * score values — the documented assumption: scores are
    * low-cardinality signals like integer lengths or bucketed
    * qualities, ≪ corpus size) gets a running strictly-greater count
    * via a window over that tiny frame, the threshold row broadcasts,
    * and membership is a scalar comparison on the scan. The oracle
    * replays the contract as a global RANK — same set, different plan,
    * which is exactly the point. */
  def keepTopFraction(docs: DataFrame, scoreCol: String,
                      frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac out of (0,1]: $frac")
    import org.apache.spark.sql.expressions.Window
    val n = docs.agg(count(lit(1)).as("n_total"))
    val hist = docs.groupBy(col(scoreCol).as("_score"))
      .agg(count(lit(1)).as("_cnt"))
    val wDesc = Window.orderBy(col("_score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cutoffs = hist
      .withColumn("_cnt_gt", coalesce(sum(col("_cnt")).over(wDesc), lit(0L)))
      .crossJoin(broadcast(n))
      .filter(col("_cnt_gt") < floor(lit(frac) * col("n_total")).cast("long"))
      .select(col("_score"))
    docs.join(broadcast(cutoffs),
      docs(scoreCol) === cutoffs("_score"), "left_semi")
  }

  /** One survivor per near-dup cluster — the HIGHEST-QUALITY member
    * rather than the arbitrary min-id winner the drop-list stages use
    * (when a crawl picks up the same article with and without boilerplate,
    * min-id keeps whichever was ingested first; quality-argmax keeps the
    * clean one). `clusters` is an `(idCol, cluster_id)` assignment
    * ([[Dedup.connectedComponents]] output); `score` is any deterministic
    * per-row quality column — ties break by ascending id so the survivor
    * is total-ordered and replayable.
    *
    * Scale shape: the window partitions by `cluster_id` — one exchange
    * of (id, cluster, score) projections, never document bodies; the
    * surviving ids then semi-join back to the full rows. Cluster sizes
    * are bounded upstream by the dedup capping machinery, so no window
    * partition degenerates. */
  def keepBestInCluster(docs: DataFrame, clusters: DataFrame,
                        idCol: String, score: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val winners = docs.join(clusters, Seq(idCol))
      .select(col(idCol), col("cluster_id"), score.as("_score"))
      .withColumn("_rk",
        row_number().over(Window.partitionBy(col("cluster_id"))
          .orderBy(col("_score").desc, col(idCol).asc)))
      .filter(col("_rk") === 1)
      .select(col(idCol), col("cluster_id"))
    docs.join(winners, Seq(idCol))
  }
}
