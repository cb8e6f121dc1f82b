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

  /** Deterministic bucket in [0, buckets) from an integer key: two
    * Lehmer rounds, then a modulus. Sequential keys scatter because
    * `buckets` never divides the prime modulus. */
  def hashBucket(key: Column, buckets: Int): Column = {
    val h1 = pmod(pmod(key.cast("long"), lit(Modulus)) * Multiplier, lit(Modulus))
    val h2 = pmod(h1 * Multiplier, lit(Modulus))
    pmod(h2, lit(buckets.toLong))
  }

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
}
