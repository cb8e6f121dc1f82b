package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PackWindow

/** Sequence packing: assign documents to fixed token-budget training
  * sequences. Beyond the reference's surface (it has no training-data
  * layer), but a standard pretraining-pipeline stage: packed sequences
  * keep every training step's context window full instead of padding
  * (Raffel et al., JMLR 2020 §2.2).
  *
  * Shape: one deterministic Lehmer shard per document
  * ([[Sampling.hashBucket]] — replayable in the oracle), then a
  * next-fit stateful scan per shard via the custom
  * [[graft.functions.NextFitPackId]] window function. The whole
  * operator is ONE hash exchange of (id, token-count) rows — document
  * text is consumed by the token counter in the scan projection and
  * never shuffled. Shard count trades parallelism against tail waste
  * (one partially-filled final pack per shard); at cluster scale set it
  * to a small multiple of executor cores.
  *
  * Determinism: shard is a pure function of the id, pack order is the
  * id order within the shard — identical across runs, partitionings,
  * and engines, like everything else in the curation layer.
  */
object Packing {

  /** Per-document pack assignment: `(id, n_tok, shard, pack_id,
    * oversize)`. `pack_id` is per-shard, 1-based, contiguous;
    * `oversize` marks documents whose own token count exceeds the
    * budget (they sit alone in their pack — split or drop downstream).
    */
  def packAssignments(df: DataFrame, idCol: String, textCol: String,
                      budget: Long, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    df.select(
        col(idCol),
        TextAnalysis.tokenCount(col(textCol)).as("n_tok"),
        Sampling.hashBucket(col(idCol), shards).as("shard"))
      .withColumn("pack_id", PackWindow.next_fit_pack(col("n_tok"), budget,
        partitionBy = Seq(col("shard")), orderBy = Seq(col(idCol))))
      .withColumn("oversize", col("n_tok") > budget)
  }

  /** Per-pack roll-up of [[packAssignments]]: `(shard, pack_id, n_docs,
    * pack_tokens, fill_frac)`. The partial-aggregate shuffle key
    * (shard, pack_id) is a refinement of the window key, so AQE plans
    * the roll-up without a second full exchange of the assignment rows.
    */
  def packStats(assignments: DataFrame, budget: Long): DataFrame =
    assignments
      .groupBy("shard", "pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok").cast("long")).as("pack_tokens"))
      .withColumn("fill_frac",
        round(col("pack_tokens").cast("double") / budget.toDouble, 4))
}
