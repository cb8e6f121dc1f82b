package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incrementally-maintained materialized aggregates over
  * [[Manifest]] tables — the consumer the row-level change feed
  * ([[Manifest.changes]]) exists for.
  *
  * The view is a Manifest table holding `keyCols`, a SUM and a COUNT
  * per key (`sum_value`, `n_rows` — AVG is derivable), plus a hash
  * `bucket` partition column. A refresh reads ONLY the change feed
  * between the view's recorded base version and the base's latest
  * version, aggregates the deltas (insert = +value/+1, delete =
  * −value/−1 — SUM/COUNT form an abelian group, so deletes subtract
  * exactly), and folds them into the view by key. Keys whose count
  * reaches zero drop out, so the view equals the from-scratch GROUP BY
  * at every refresh (the oracle-checked contract).
  *
  * Scale shape, piece by piece:
  *  - the DELTA read opens only files added/removed between the two
  *    base versions ([[Manifest.changes]]) — cost ∝ changed data,
  *    never the base table;
  *  - the FOLD rewrites only the view files whose `bucket` partitions
  *    the delta touches ([[Manifest.rewrite]]'s candidate pruning) —
  *    cost ∝ touched keys, never the view;
  *  - the COMMIT is one atomic pointer create carrying BOTH the new
  *    view snapshot and the `(appId, baseVersion)` watermark
  *    ([[Manifest.lastTxn]]), so a crash anywhere either applies the
  *    whole refresh or none of it — re-running cannot double-count a
  *    delta (the half-applied-refresh failure mode of any
  *    two-step "update rows, then bump watermark" design).
  *
  * This is the standard IVM formulation (deltas of a distributive
  * aggregate folded by key — e.g. Materialize/DBSP's Z-set view
  * maintenance, or Delta's MERGE-based incremental gold tables),
  * expressed over the manifest protocol so the watermark rides the
  * data commit.
  */
object Incremental {

  /** Txn app-id namespace for view watermarks. */
  private def viewAppId: String = "graft-incr-view"

  /** The view's RETENTION PIN name on its base table: the watermark's
    * public claim that the base snapshot it anchors on must survive
    * vacuum ([[Manifest.pin]]). */
  private def basePinName(viewDir: String): String =
    "view-" + java.security.MessageDigest.getInstance("MD5")
      .digest(viewDir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  private val Buckets = 32

  private def bucketOf(keyCols: Seq[String]) =
    pmod(xxhash64(keyCols.map(col): _*), lit(Buckets.toLong)).as("bucket")

  /** Sums live in exact DECIMAL space (money-typed: two fractional
    * digits in, a wide accumulator stored) — decimal adds are
    * associative AND subtractable, so delta folds across any number of
    * refreshes reproduce the from-scratch sum bit-for-bit; float sums
    * would drift order-dependently. */
  private val SumType = DecimalType(38, 2)
  private def money(c: Column): Column = c.cast(DecimalType(12, 2))
  private val zeroSum = lit(0).cast(SumType)

  /** Bring the view at `viewDir` up to date with the base Manifest
    * table at `baseDir`, incrementally. Creates the view (one full
    * GROUP BY of the base) on first call. Returns the base version the
    * view now reflects. Idempotent: re-running after any crash
    * converges (the watermark commits atomically with the fold), and
    * an already-current view no-ops. `valueCol` must be numeric;
    * key columns must not be null-valued in the base (group keys).
    *
    * UNREADABLE-WATERMARK fallback: when the watermark can no longer
    * anchor a change feed — the base's snapshot at that version was
    * vacuumed, or the view's own marker was vacuumed off its pointers —
    * refresh degrades to ONE full rebuild (atomic overwrite carrying a
    * fresh watermark) instead of wedging; incremental refresh resumes
    * from there. Retention below refresh cadence therefore costs
    * rebuild economics, never availability. OWNERSHIP contract:
    * `viewDir` belongs to exactly one (baseDir, keyCols, valueCol)
    * definition — the rebuild distinguishes a foreign table at that
    * path only by schema (overwrite fails loudly on mismatch), so two
    * same-schema views sharing a dir would silently trade contents. */
  def refresh(spark: SparkSession, baseDir: String, viewDir: String,
              keyCols: Seq[String], valueCol: String): Long = {
    val baseV = Manifest.latestVersion(spark, baseDir)
      .getOrElse(throw new IllegalArgumentException(s"no table at $baseDir"))
    val outCols = keyCols.map(col) ++ Seq(col("sum_value"), col("n_rows"))

    /** The from-scratch view of the base at `baseV` — used by first
      * build and by every unreadable-watermark rebuild, so the two can
      * never diverge in shape. */
    def fullBuild: DataFrame = Manifest.readVersion(spark, baseDir, baseV)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(money(col(valueCol))).cast(SumType).as("sum_value"),
        count(lit(1)).as("n_rows"))
      .select(outCols :+ bucketOf(keyCols): _*)

    def rebuild(): Long = {
      if (Manifest.latestVersion(spark, viewDir).isEmpty)
        Manifest.create(spark, viewDir, fullBuild, "bucket",
          txn = Some(viewAppId -> baseV))
      else
        Manifest.overwrite(spark, viewDir, fullBuild, "bucket",
          txn = Some(viewAppId -> baseV))
      Manifest.pin(spark, baseDir, basePinName(viewDir), baseV)
      baseV
    }

    Manifest.lastTxn(spark, viewDir, viewAppId) match {
      case None => rebuild() // first build, or marker vacuumed away

      case Some(viewV) if viewV >= baseV => viewV // already current

      case Some(viewV)
        if !Manifest.versions(spark, baseDir).contains(viewV) =>
        rebuild() // base vacuumed past the watermark

      case Some(viewV) =>
        // signed delta aggregate per key over the changed files only.
        // The UNCANCELLED feed suffices: a row carried unchanged through
        // a rewrite appears +1 and -1 and cancels in the signed sums, so
        // the exact feed's two exceptAll shuffles are skipped entirely.
        // Persisted, because the fold consumes it twice (touched-bucket
        // discovery, then the join).
        val delta = Manifest.changesSigned(spark, baseDir, viewV, baseV)
          .groupBy(keyCols.map(col): _*)
          .agg(sum(col("sign") * money(col(valueCol))).cast(SumType)
            .as("d_sum"),
            sum(col("sign")).as("d_rows"))
          // keys whose rows were only CARRIED through a rewrite net to
          // zero — drop them here so they don't count as touched and
          // inflate the fold's bucket rewrite
          .filter(col("d_rows") =!= 0 || col("d_sum") =!= zeroSum)
          .select(keyCols.map(col) ++
            Seq(col("d_sum"), col("d_rows")) :+ bucketOf(keyCols): _*)
          .persist()
        // fold into the view: only bucket partitions the delta touches
        // are read and rewritten; the watermark rides the same commit
        try Manifest.rewrite(spark, viewDir, delta, "bucket",
          requireFullSchema = false, txn = Some(viewAppId -> baseV)) {
          (target, batch) =>
            val joined = target.alias("t").join(batch.alias("d"),
              keyCols.map(k => col(s"t.$k") <=> col(s"d.$k")).reduce(_ && _),
              "full_outer")
            joined.select(
              keyCols.map(k => coalesce(col(s"t.$k"), col(s"d.$k")).as(k)) ++
                Seq(
                  (coalesce(col("t.sum_value"), zeroSum) +
                    coalesce(col("d.d_sum"), zeroSum)).cast(SumType)
                    .as("sum_value"),
                  (coalesce(col("t.n_rows"), lit(0L)) +
                    coalesce(col("d.d_rows"), lit(0L))).as("n_rows"),
                  coalesce(col("t.bucket"), col("d.bucket")).as("bucket")): _*)
              .filter(col("n_rows") > 0)
        } finally delta.unpersist()
        // watermark advanced: move the base pin with it (crash between
        // commit and pin leaves the pin LOWER — vacuum just retains
        // more than needed until the next refresh, never less)
        Manifest.pin(spark, baseDir, basePinName(viewDir), baseV)
        baseV
    }
  }

  /** Read the current view (keys + `sum_value` + `n_rows`; the
    * internal `bucket` column is dropped). */
  def read(spark: SparkSession, viewDir: String): DataFrame =
    Manifest.read(spark, viewDir).drop("bucket")

  /** The base version the view currently reflects (None = no view). */
  def refreshedAt(spark: SparkSession, viewDir: String): Option[Long] =
    Manifest.lastTxn(spark, viewDir, viewAppId)

  // ---- incremental JOIN views ----

  private def joinAppId: String = "graft-incr-join"

  private def joinPinName(viewDir: String, side: String): String =
    s"view$side-" + java.security.MessageDigest.getInstance("MD5")
      .digest(viewDir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  /** Max distinct delta join keys pushed as an `isin` pre-filter into
    * the refresh's streamed side (past it, the In-list stops planning
    * well and the scan is the right venue). */
  private val KeyFilterCap = 10000

  /** Both base watermarks packed into the view's single txn slot —
    * monotone in (vA, vB) because versions only grow, so the
    * exactly-once `lastTxn >= packed` comparison keeps working. 31
    * bits per side bounds a view's base at ~2×10⁹ commits. */
  private def packW(vA: Long, vB: Long): Long = (vA << 31) | vB
  private def unpackW(p: Long): (Long, Long) = (p >>> 31, p & ((1L << 31) - 1))

  /** Incrementally-maintained materialized INNER EQUI-JOIN view over
    * two [[Manifest]] tables — the bilinear half of IVM the aggregate
    * [[refresh]] can't express. The view is a Manifest table holding
    * one row per DISTINCT joined output row (`aCols` from A, `bCols`
    * from B) with its multiplicity `n_rows` (the Z-set encoding:
    * counts make deletes exact), hash-bucketed like [[refresh]]'s.
    *
    * A refresh applies the standard bilinear delta
    * `Δ(A⋈B) = ΔA⋈B_new + A_old⋈ΔB` (the ΔA⋈ΔB cross term is
    * absorbed by joining ΔA against B at its NEW version) with SIGNED
    * change feeds on both sides — uncancelled carried rows net to
    * zero in the signed counts, exactly as in [[refresh]]. Cost
    * shape: the delta reads open only each side's changed files; the
    * joins stream the other side once (no rewrite of it); the fold
    * rewrites only the view buckets the delta touches; and the packed
    * (vA, vB) watermark rides the fold's commit atomically, so a
    * crash-replayed refresh converges instead of double-counting.
    * Unreadable watermarks (vacuumed base snapshots) degrade to one
    * full rebuild, like [[refresh]]. Returns the (A, B) versions the
    * view now reflects. */
  def refreshJoin(spark: SparkSession, aDir: String, bDir: String,
                  viewDir: String, aKey: String, bKey: String,
                  aCols: Seq[String], bCols: Seq[String]): (Long, Long) = {
    val all = aCols ++ bCols
    require(all.distinct.size == all.size,
      s"view columns must be disjoint across sides: ${all.mkString(",")}")
    // case-insensitive like Spark's own column resolution — a view
    // column named "Sign" would otherwise pass and then collide
    require(!all.exists(c => c.equalsIgnoreCase("n_rows") ||
      c.equalsIgnoreCase("bucket") || c.equalsIgnoreCase("sign")),
      "view columns n_rows/bucket/sign are reserved")
    val vA = Manifest.latestVersion(spark, aDir)
      .getOrElse(throw new IllegalArgumentException(s"no table at $aDir"))
    val vB = Manifest.latestVersion(spark, bDir)
      .getOrElse(throw new IllegalArgumentException(s"no table at $bDir"))
    val outCols = all.map(col)

    def joined(a: DataFrame, b: DataFrame): DataFrame =
      a.alias("a").join(b.alias("b"), col(s"a.$aKey") === col(s"b.$bKey"))
        .select(aCols.map(c => col(s"a.$c")) ++
          bCols.map(c => col(s"b.$c")): _*)

    def fullBuild: DataFrame =
      joined(Manifest.readVersion(spark, aDir, vA),
        Manifest.readVersion(spark, bDir, vB))
        .groupBy(outCols: _*).agg(count(lit(1)).as("n_rows"))
        .select(outCols ++ Seq(col("n_rows")) :+ bucketOf(all): _*)

    def pins(): Unit = {
      Manifest.pin(spark, aDir, joinPinName(viewDir, "a"), vA)
      Manifest.pin(spark, bDir, joinPinName(viewDir, "b"), vB)
    }

    def rebuild(): (Long, Long) = {
      if (Manifest.latestVersion(spark, viewDir).isEmpty)
        Manifest.create(spark, viewDir, fullBuild, "bucket",
          txn = Some(joinAppId -> packW(vA, vB)))
      else
        Manifest.overwrite(spark, viewDir, fullBuild, "bucket",
          txn = Some(joinAppId -> packW(vA, vB)))
      pins()
      (vA, vB)
    }

    Manifest.lastTxn(spark, viewDir, joinAppId) match {
      case None => rebuild()
      case Some(p) =>
        val (wA, wB) = unpackW(p)
        if (wA >= vA && wB >= vB) (wA, wB)
        else if (!Manifest.versions(spark, aDir).contains(wA) ||
          !Manifest.versions(spark, bDir).contains(wB)) rebuild()
        else {
          // ΔA ⋈ B@new carries ΔA's sign; A@old ⋈ ΔB carries ΔB's —
          // each matched pair contributes sign × 1 to its output row's
          // multiplicity, summed below. The STREAMED side of each term
          // pre-filters by the delta's distinct join keys when the
          // delta is small: the `isin` reaches the pruning FileIndex
          // (stats/bloom skipping) and the parquet row groups, so a
          // ten-row delta against a 100 TB other side opens only the
          // files that can match — sound for an inner join (filtered
          // rows can't contribute), a plain scan past the cap.
          def keyFiltered(big: DataFrame, keyCol: String,
                          delta: DataFrame, deltaKey: String): DataFrame = {
            val ks = delta.select(col(deltaKey)).distinct()
              .limit(KeyFilterCap + 1).collect().map(_.get(0))
            if (ks.length <= KeyFilterCap && ks.nonEmpty)
              big.where(col(keyCol).isin(ks.toIndexedSeq: _*))
            else big
          }
          // each signed change feed is consumed TWICE (the keyFiltered
          // key collect, then the join itself) — persist it so the
          // changes scan runs once per side, not per consumer
          val dAOpt =
            if (vA > wA)
              Some(Manifest.changesSigned(spark, aDir, wA, vA).persist())
            else None
          val dBOpt =
            if (vB > wB)
              Some(Manifest.changesSigned(spark, bDir, wB, vB).persist())
            else None
          try {
            val parts = Seq(
              dAOpt.map { dA =>
                dA.alias("a")
                  .join(keyFiltered(Manifest.readVersion(spark, bDir, vB),
                    bKey, dA, aKey).alias("b"),
                    col(s"a.$aKey") === col(s"b.$bKey"))
                  .select(aCols.map(c => col(s"a.$c")) ++
                    bCols.map(c => col(s"b.$c")) :+ col("a.sign"): _*)
              },
              dBOpt.map { dB =>
                keyFiltered(Manifest.readVersion(spark, aDir, wA),
                  aKey, dB, bKey).alias("a")
                  .join(dB.alias("b"),
                    col(s"a.$aKey") === col(s"b.$bKey"))
                  .select(aCols.map(c => col(s"a.$c")) ++
                    bCols.map(c => col(s"b.$c")) :+ col("b.sign"): _*)
              }).flatten
            val delta = parts.reduce(_ unionByName _)
              .groupBy(outCols: _*).agg(sum(col("sign")).as("d_rows"))
              .filter(col("d_rows") =!= 0)
              .select(outCols ++ Seq(col("d_rows")) :+ bucketOf(all): _*)
              .persist()
            try Manifest.rewrite(spark, viewDir, delta, "bucket",
              requireFullSchema = false,
              txn = Some(joinAppId -> packW(vA, vB))) { (target, batch) =>
              target.alias("t").join(batch.alias("d"),
                all.map(c => col(s"t.$c") <=> col(s"d.$c")).reduce(_ && _),
                "full_outer")
                .select(all.map(c =>
                  coalesce(col(s"t.$c"), col(s"d.$c")).as(c)) ++ Seq(
                  (coalesce(col("t.n_rows"), lit(0L)) +
                    coalesce(col("d.d_rows"), lit(0L))).as("n_rows"),
                  coalesce(col("t.bucket"), col("d.bucket")).as("bucket")): _*)
                .filter(col("n_rows") > 0)
            } finally delta.unpersist()
          } finally {
            dAOpt.foreach(_.unpersist())
            dBOpt.foreach(_.unpersist())
          }
          pins()
          (vA, vB)
        }
    }
  }

  /** The (A, B) base versions the join view reflects (None = no view). */
  def joinRefreshedAt(spark: SparkSession,
                      viewDir: String): Option[(Long, Long)] =
    Manifest.lastTxn(spark, viewDir, joinAppId).map(unpackW)
}
