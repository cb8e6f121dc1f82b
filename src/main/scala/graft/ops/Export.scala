package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-data export: a reproducible global shuffle
  * and fixed shard assignment — the last stage of the curation →
  * packing → export pipeline. Training loaders want (a) documents in a
  * pseudo-random order decorrelated from ingest order (neighboring
  * crawl pages otherwise land in the same batch), (b) a fixed shard
  * count with near-uniform sizes for data-parallel readers, and (c) a
  * layout that is a pure function of the data so a re-export after an
  * upstream fix is byte-comparable.
  *
  * Same design rules as [[Sampling]]: the order key is Lehmer-mixed
  * from the document id (two Park–Miller rounds, all intermediates
  * < 2^48 so ANSI-mode BIGINT arithmetic never overflows and the
  * DuckDB oracle replays it exactly), never `rand()` — RNG order is
  * irreproducible across runs/partitionings and unreplayable.
  *
  * Scale shape: the assignment is a scalar projection on the scan (no
  * shuffle); the physical write exchanges once on the shard id and
  * locally sorts by the order key — `(shard, pos)` is a total order,
  * so "read shards in order, rows in file order" IS the global
  * shuffle, with no global sort ever materialized.
  */
object Export {
  import Sampling.{Modulus, Multiplier}

  /** Pseudo-random order key in [0, 2^31−1): seed folded in mod M,
    * then the library's shared two-round Lehmer mix
    * ([[Sampling.lehmerMix]]). */
  def shuffleKey(key: Column, seed: Long = 0L): Column = {
    val s = ((seed % Modulus) + Modulus) % Modulus
    Sampling.lehmerMix(
      pmod(pmod(key.cast("long"), lit(Modulus)) + lit(s), lit(Modulus)))
  }

  /** The scalar assignment columns: order key + shard id. Pure
    * projection — no shuffle. */
  private def assigned(df: DataFrame, idCol: String, numShards: Int,
                       seed: Long): DataFrame =
    df.withColumn("shuffle_key", shuffleKey(col(idCol), seed))
      .withColumn("shard", pmod(col("shuffle_key"), lit(numShards.toLong)))

  private def posWindow(idCol: String) =
    Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col(idCol))

  /** Shard assignment + within-shard position for every row:
    * `shard = key mod numShards` (the modulus never divides the Lehmer
    * prime, so shards are near-uniform), `pos` = 1-based rank of the
    * order key inside the shard (id tiebreak: the 2^31 key space WILL
    * collide at corpus scale, and an untied rank would make `pos`
    * nondeterministic). One window partitioning = one exchange. */
  def shuffledShards(df: DataFrame, idCol: String, numShards: Int,
                     seed: Long = 0L): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    assigned(df, idCol, numShards, seed)
      .withColumn("pos", row_number().over(posWindow(idCol)).cast("long"))
  }

  /** Write the shuffled corpus as one directory per shard
    * (`shard=<k>/`), rows inside each shard's files in shuffle order.
    *
    * ONE corpus shuffle total: the explicit `repartition(numShards,
    * shard)` comes FIRST, and the position window's clustered-
    * distribution requirement is already satisfied by it, so
    * EnsureRequirements adds no second exchange — the window's
    * (shard, key) sort doubles as the write order, and each task owns
    * whole shards for the partitioned write. */
  def writeShuffled(df: DataFrame, idCol: String, dir: String,
                    numShards: Int, seed: Long = 0L): Unit =
    shuffledForWrite(df, idCol, numShards, seed)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(dir)

  /** The exact frame [[writeShuffled]] writes — exposed so the plan
    * spec asserts the one-exchange property on the production path,
    * not a replica. */
  private[ops] def shuffledForWrite(df: DataFrame, idCol: String,
                                    numShards: Int,
                                    seed: Long = 0L): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    assigned(df, idCol, numShards, seed)
      .repartition(numShards, col("shard"))
      .withColumn("pos", row_number().over(posWindow(idCol)).cast("long"))
  }
}
