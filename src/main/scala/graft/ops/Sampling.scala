package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-keyed sampling for training-data curation —
  * beyond the reference's surface (it has no sampling), but a standard
  * requirement of corpus pipelines: reproducible subsets, per-stratum
  * rates, and disjoint train/validation/test splits.
  *
  * Why hash-based instead of `df.sample()` / `rand()`:
  *  - **reproducible**: membership is a pure function of the row's key —
  *    identical across runs, partitionings, cluster sizes, and engines
  *    (the DuckDB oracle replays the exact arithmetic);
  *  - **stable under reprocessing**: a re-ingested or late-arriving row
  *    lands in the same split, so train/test contamination can't creep
  *    in when the corpus is rebuilt incrementally;
  *  - **plan-friendly**: the decision is a scalar predicate on the scan
  *    (no RNG state, no per-partition seeds), so it survives predicate
  *    pushdown and costs nothing at 100 TB.
  *
  * The mixer is two rounds of the Park–Miller/Lehmer step
  * `h → h·48271 mod (2^31−1)` (minstd; Park & Miller, CACM 1988).
  * Every intermediate stays < 2^47, so the arithmetic never overflows a
  * BIGINT — exactly representable in Spark under ANSI mode and in the
  * DuckDB oracle, with no wraparound tricks needed.
  */
object Sampling {

  /** 2^31 − 1, the Mersenne-prime Park–Miller modulus. */
  val Modulus: Long = 2147483647L
  /** The minstd multiplier. */
  val Multiplier: Long = 48271L

  /** Two multiplicative Lehmer rounds over an already-reduced state in
    * [0, [[Modulus]]): THE mixing recipe every deterministic-key op in
    * the library shares ([[hashBucket]], [[capPerDomain]],
    * [[graft.ops.Export.shuffleKey]]) — one definition, so the
    * arithmetic the DuckDB oracles replay can never fork between
    * call sites. */
  def lehmerMix(h0: Column): Column =
    pmod(pmod(h0 * Multiplier, lit(Modulus)) * Multiplier, lit(Modulus))

  /** Deterministic bucket in [0, buckets) from an integer key: two
    * Lehmer rounds, then a modulus. Sequential keys scatter because
    * `buckets` never divides the prime modulus. */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(lehmerMix(pmod(key.cast("long"), lit(Modulus))), lit(buckets.toLong))

  /** Keep ~`fraction` of rows, decided by the key's hash bucket out of
    * `buckets` (default 10000 ⇒ rate granularity 0.01%). */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double,
                   buckets: Int = 10000): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of [0,1]: $fraction")
    df.filter(hashBucket(col(keyCol), buckets) < math.round(fraction * buckets))
  }

  /** Per-stratum sampling rates: rows of a stratum not listed in
    * `fractions` are dropped (matching `sampleBy` semantics). One scan,
    * one predicate — no per-stratum passes. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       fractions: Seq[(String, Double)],
                       buckets: Int = 10000): DataFrame = {
    val bucket = hashBucket(col(keyCol), buckets)
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === stratum && bucket < math.round(f * buckets))
    }
    df.filter(keep)
  }

  /** Assign each row to exactly one named split by cumulative weight
    * ranges over the hash bucket — disjoint and exhaustive by
    * construction (weights must sum to 1 within rounding of the bucket
    * granularity). */
  def assignSplit(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)],
                  buckets: Int = 10000): DataFrame = {
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split weights must sum to 1 (got $total)")
    val bucket = hashBucket(col(keyCol), buckets)
    val cuts = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    // ascending cumulative cuts: the first satisfied WHEN names the split
    val named = splits.map(_._1).zip(cuts.map(c => math.round(c * buckets)))
    val expr = named.tail.foldLeft(
      when(bucket < named.head._2, named.head._1)) {
      case (acc, (name, cut)) => acc.when(bucket < cut, name)
    }
    df.withColumn("split", expr)
  }

  /** Leakage-safe split: key the split decision on the row's near-dup
    * CLUSTER id rather than its own id, so every member of a duplicate
    * family lands in the same split — the standard defence against
    * train/test contamination via near-duplicates (a paraphrased test
    * document leaking into train defeats a per-document split; cf. the
    * dedup-before-split step in Rae et al. '21 §A1.3).
    *
    * `clusters` is an `(idCol, cluster_id)` assignment — the output
    * shape of [[Dedup.connectedComponents]] / [[Dedup.nearDupClusters]].
    * Singletons are their own cluster (cluster_id = own id), so
    * un-duplicated rows split exactly as [[assignSplit]] would.
    *
    * Scale shape: one equi-join on the id (clusters is id-cardinality —
    * co-partitionable or bucketed with the corpus), then the same
    * scalar split projection as [[assignSplit]]; no extra shuffle
    * beyond the join. */
  def leakageSafeSplit(df: DataFrame, clusters: DataFrame, idCol: String,
                       splits: Seq[(String, Double)],
                       buckets: Int = 10000): DataFrame =
    assignSplit(df.join(clusters, Seq(idCol)), "cluster_id", splits, buckets)

  /** Temperature-smoothed domain mixture at T = 1/2 (square-root
    * sampling — the standard smoothing that upweights low-resource
    * domains relative to proportional sampling; exponent-α smoothing
    * with α = 0.5 as in multilingual-corpus practice). Keeps an
    * expected `targetFrac` of the corpus, with per-domain quotas
    * `k_d = floor(K · √n_d / Σ√n)` instead of `K · n_d / N` —
    * a 100×-larger domain gets only 10× the quota.
    *
    * Exactness contract: every quantity is integral — `floor(sqrt(n))`
    * (exact for n < 2^52: correctly-rounded sqrt can't cross the next
    * integer at that magnitude), bigint sums, and membership by the
    * cross-multiplied comparison `bucket · n_d < k_d · buckets` (no
    * division) — so the DuckDB oracle replays the cut bit-for-bit.
    * Bounds: `K · w_d` and `k_d · buckets` stay under 2^63 for corpora
    * to ~10^12 rows at the default bucket count.
    *
    * Scale shape: one count-per-domain aggregate (tiny — domain
    * cardinality), the quota arithmetic on that broadcast frame, and a
    * scalar membership predicate on the scan. No shuffle of the corpus
    * itself. */
  def temperatureMixture(df: DataFrame, keyCol: String, domainCol: String,
                         targetFrac: Double,
                         buckets: Int = 10000): DataFrame = {
    require(targetFrac > 0 && targetFrac <= 1, s"targetFrac out of (0,1]: $targetFrac")
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_d"))
      .withColumn("w_d", floor(sqrt(col("n_d"))).cast("long"))
    val totals = counts.agg(
      sum("n_d").as("n_total"), sum("w_d").as("w_total"))
    val quotas = counts.crossJoin(broadcast(totals))
      .withColumn("k_big", floor(lit(targetFrac) * col("n_total")).cast("long"))
      .withColumn("k_quota", expr("(k_big * w_d) DIV w_total"))
      .select(col(domainCol), col("n_d"), col("w_d"), col("k_quota"))
    df.join(broadcast(quotas), Seq(domainCol))
      .filter(hashBucket(col(keyCol), buckets) * col("n_d") <
        col("k_quota") * buckets)
  }

  /** Hard per-domain cap: at most `maxPerDomain` rows from any domain,
    * chosen by Lehmer-key rank (id tiebreak) so the surviving subset is
    * deterministic and decorrelated from ingest order — the guard
    * against a single over-crawled domain dominating the mixture.
    *
    * Scale shape: one window exchange keyed on the domain; only
    * (key, domain) projections need to rank — callers pass the full
    * frame and the filter drops rows in place. The rank pushes down as
    * a WindowGroupLimit, so no task buffers more than the cap per
    * domain. */
  def capPerDomain(df: DataFrame, keyCol: String, domainCol: String,
                   maxPerDomain: Int): DataFrame = {
    require(maxPerDomain >= 1, s"maxPerDomain must be >= 1: $maxPerDomain")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("_rank_key").asc, col(keyCol).asc)
    df.withColumn("_rank_key",
        lehmerMix(pmod(col(keyCol).cast("long"), lit(Modulus))))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= maxPerDomain)
      .drop("_rank_key", "_rk")
  }
}
