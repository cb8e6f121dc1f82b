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
    *
    * `decreasing = true` switches to next-fit-DECREASING: each shard
    * packs its documents longest-first, the classic bin-packing
    * improvement (large items placed while packs are empty, small ones
    * plug the tails). Still fully deterministic — the order is
    * (n_tok desc, id) — and still one stateful scan per shard.
    */
  def packAssignments(df: DataFrame, idCol: String, textCol: String,
                      budget: Long, shards: Int,
                      decreasing: Boolean = false): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    val order =
      if (decreasing) Seq(col("n_tok").desc, col(idCol)) else Seq(col(idCol))
    df.select(
        col(idCol),
        TextAnalysis.tokenCount(col(textCol)).as("n_tok"),
        Sampling.hashBucket(col(idCol), shards).as("shard"))
      .withColumn("pack_id", PackWindow.next_fit_pack(col("n_tok"), budget,
        partitionBy = Seq(col("shard")), orderBy = order))
      .withColumn("oversize", col("n_tok") > budget)
  }

  /** Budget chunking — the complement of packing for oversize
    * documents: split each document into `ceil(n_tok / budget)`
    * contiguous token windows. `(id, chunk_idx, chunk_tok, n_chunks)`,
    * one row per chunk; every chunk is exactly `budget` tokens except
    * the last. A pure projection + generator — no shuffle at all; at
    * 100 TB this is scan-rate work.
    */
  def chunkByBudget(df: DataFrame, idCol: String, textCol: String,
                    budget: Int): DataFrame = {
    require(budget > 0, s"chunk budget must be positive: $budget")
    val nChunks = ((col("n_tok") + budget - 1) / budget).cast("int")
    df.select(col(idCol), TextAnalysis.tokenCount(col(textCol)).as("n_tok"))
      .withColumn("n_chunks", nChunks)
      .withColumn("chunk_idx",
        explode(sequence(lit(0), col("n_chunks") - 1)))
      .withColumn("chunk_tok",
        least(lit(budget), col("n_tok") - col("chunk_idx") * budget))
      .select(col(idCol), col("chunk_idx"), col("chunk_tok"), col("n_chunks"))
  }

  /** Sliding-window chunking with overlap — the embedding/RAG prep
    * shape ([[chunkByBudget]] cuts disjoint windows; retrieval wants
    * windows of `size` tokens every `stride` tokens so no boundary
    * sentence is ever split away from all its context). One row per
    * window with the ACTUAL token slice re-joined as text:
    * `(id, chunk_idx, chunk_tok, chunk_text)`. Windows start at
    * `0, stride, 2·stride, …`; the last starts within `size` of the
    * end, so every token is covered and trailing windows shrink.
    * A token-free document yields one empty chunk (explicit, rather
    * than vanishing — mirrors [[graft.ops.CorpusStats.unigramSurprisal]]'s
    * empty-doc contract).
    *
    * Pure projection + generator over the scan — no shuffle; the
    * tokens array materializes once per document and every window
    * slices it (no per-window re-tokenization). */
  def chunkSliding(df: DataFrame, idCol: String, textCol: String,
                   size: Int, stride: Int): DataFrame = {
    require(size > 0, s"window size must be positive: $size")
    require(stride > 0 && stride <= size,
      s"stride must be in [1, size]: $stride")
    val toks = TextAnalysis.nonEmptyTokens(col(textCol))
    val nWin = when(col("n_tok") <= size, lit(1))
      .otherwise(((col("n_tok") - size + stride - 1) / stride).cast("int") + 1)
    df.select(col(idCol), toks.as("toks"))
      .withColumn("n_tok", size_(col("toks")))
      .withColumn("n_win", nWin)
      .withColumn("chunk_idx", explode(sequence(lit(0), col("n_win") - 1)))
      .select(col(idCol), col("chunk_idx"),
        least(lit(size), col("n_tok") - col("chunk_idx") * stride)
          .cast("long").as("chunk_tok"),
        array_join(slice(col("toks"), col("chunk_idx") * stride + 1,
          lit(size)), " ").as("chunk_text"))
  }
  // `size` the Column function, shadowed by the parameter name above
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)

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
