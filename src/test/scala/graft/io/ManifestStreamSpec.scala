package graft.io

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec
import graft.ops.Manifest

/** The manifest table as a Structured Streaming source: version-range
  * offsets, CDC initial load, per-commit `_commit_version` labeling,
  * admission control, checkpoint restart, the append-mode fast path's
  * loud rewrite refusal, and the retention pin's lifecycle. */
class ManifestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() = Files.createTempDirectory("graft-mstream").toString

  private def base = spark.range(1, 7)
    .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" % 2).as("p"))

  private def start(dir: String, ckpt: String, name: String,
                    opts: Map[String, String] = Map.empty): StreamingQuery = {
    val r = opts.foldLeft(spark.readStream.format("graft-manifest")) {
      case (b, (k, v)) => b.option(k, v)
    }
    r.load(dir).writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt).start()
  }

  private def sinkRows(name: String): DataFrame = spark.table(name)

  /** Fold the CDC stream's rows back into table state: per key, apply
    * versions in order, deletes before inserts within a version (the
    * documented delivery contract). */
  private def foldCdc(rows: Seq[(Long, Double, String, Long)])
      : Map[Long, Double] = {
    val state = scala.collection.mutable.Map[Long, Double]()
    rows.groupBy(_._4).toSeq.sortBy(_._1).foreach { case (_, batch) =>
      batch.filter(_._3 == "delete").foreach(r => state.remove(r._1))
      batch.filter(_._3 == "insert").foreach(r => state(r._1) = r._2)
    }
    state.toMap
  }

  test("cdc: initial snapshot, then per-commit delete+insert changes, convergent with the table") {
    val root = newDir()
    val dir = s"$root/tbl"
    Manifest.create(spark, dir, base, "p")
    val q = start(dir, s"$root/ckpt", "ms_cdc")
    try {
      q.processAllAvailable()
      val snap = sinkRows("ms_cdc")
        .select("k", "v", "_change", "_commit_version")
        .as[(Long, Double, String, Long)].collect().toSeq
      assert(snap.size == 6 && snap.forall(r => r._3 == "insert" && r._4 == 1L),
        s"initial load must be the v1 snapshot as inserts, got $snap")

      Manifest.append(spark, dir,
        Seq((100L, 100.0, 0L), (101L, 101.0, 1L)).toDF("k", "v", "p"), "p")
      Manifest.upsert(spark, dir, Seq((1L, 111.0, 1L)).toDF("k", "v", "p"),
        Seq("k"), "p")
      q.processAllAvailable()

      val all = sinkRows("ms_cdc")
        .select("k", "v", "_change", "_commit_version")
        .as[(Long, Double, String, Long)].collect().toSeq
      val appended = all.filter(_._4 == 2L)
      assert(appended.map(r => (r._1, r._3)).toSet ==
        Set((100L, "insert"), (101L, "insert")),
        s"commit v2 must arrive as its two inserts, got $appended")
      val upserted = all.filter(_._4 == 3L)
      assert(upserted.collect { case (1L, _, c, _) => c }.toSet ==
        Set("delete", "insert"),
        s"the upsert of k=1 must arrive as a delete+insert pair, got $upserted")

      val expect = Manifest.read(spark, dir).select("k", "v")
        .as[(Long, Double)].collect().toMap
      assert(foldCdc(all) == expect,
        "folding the CDC stream must reproduce the table state exactly")
    } finally q.stop()
  }

  test("cdc over a SHALLOW CLONE streams predicate DML: update pairs, delete rows, convergent") {
    val root = newDir()
    val src = s"$root/src"; val dir = s"$root/clone"
    Manifest.create(spark, src, base, "p", statsCols = Seq("v"))
    // the stream reads the CLONE: its initial snapshot and every later
    // change-row read resolves SOURCE-resident files through _ext
    Manifest.shallowClone(spark, src, dir)
    val q = start(dir, s"$root/ckpt", "ms_cdc_dml")
    try {
      q.processAllAvailable()
      // CoW predicate update of v>=5 rows (k=5,6), then a MoR predicate
      // delete of k<=1 — both over source-resident files
      Manifest.updateWhere(spark, dir, Seq("v" -> "v + 100.0"),
        "v >= 5.0", "p")
      Manifest.deleteWhereMor(spark, dir, "k <= 1", "p")
      q.processAllAvailable()
      val all = sinkRows("ms_cdc_dml")
        .select("k", "v", "_change", "_commit_version")
        .as[(Long, Double, String, Long)].collect().toSeq
      val updated = all.filter(_._4 == 2L)
      assert(updated.map(r => (r._1, r._2, r._3)).toSet ==
        Set((5L, 5.0, "delete"), (5L, 105.0, "insert"),
          (6L, 6.0, "delete"), (6L, 106.0, "insert")),
        s"the predicate update must arrive as delete+insert pairs, got $updated")
      val deleted = all.filter(_._4 == 3L)
      assert(deleted.map(r => (r._1, r._3)).toSet == Set((1L, "delete")),
        s"the MoR predicate delete must arrive as its delete row, got $deleted")
      val expect = Manifest.read(spark, dir).select("k", "v")
        .as[(Long, Double)].collect().toMap
      assert(foldCdc(all) == expect,
        "folding the CDC stream must reproduce the clone's state exactly")
      // the source never changed
      assert(Manifest.read(spark, src).count() == 6)
    } finally q.stop()
  }

  test("checkpoint restart resumes at the committed version; pin survives and retire drops it") {
    val root = newDir()
    val dir = s"$root/tbl"; val ckpt = s"$root/ckpt"
    val out = s"$root/out"
    Manifest.create(spark, dir, base, "p")
    // the FILE sink supports checkpoint recovery (memory does not), so
    // the pair of runs also proves source-offsets + sink-log
    // end-to-end exactly-once: no snapshot replay, no duplicates
    def run(): Unit = {
      val q = spark.readStream.format("graft-manifest").load(dir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()

    // the pin is the stream's durable floor: present after the run
    val pinned = Manifest.pins(spark, dir).filter(_._1.startsWith("stream-"))
    assert(pinned.size == 1, s"expected the stream's retention pin, got $pinned")

    Manifest.append(spark, dir, Seq((200L, 2.0, 0L)).toDF("k", "v", "p"), "p")
    run()
    val rows = spark.read.parquet(out)
      .select("k", "_commit_version").as[(Long, Long)].collect().toSeq
    assert(rows.count(_._2 == 1L) == 6 && rows.count(_._2 == 2L) == 1 &&
      rows.size == 7,
      s"restart must deliver ONLY the new commit (no snapshot replay), got $rows")

    ManifestStream.retire(spark, dir, ckpt)
    assert(!Manifest.pins(spark, dir).keys.exists(_.startsWith("stream-")),
      s"retire must drop the stream's retention pin; left ${Manifest
        .pins(spark, dir)}, retire computed ${ManifestStream
        .pinName(spark, s"$ckpt/sources/0")}")
  }

  test("afterVersion anchor + maxVersionsPerTrigger=1: no snapshot, one commit per batch") {
    val root = newDir()
    val dir = s"$root/tbl"
    Manifest.create(spark, dir, base, "p")                              // v1
    (1 to 3).foreach { i =>                                             // v2..v4
      Manifest.append(spark, dir,
        Seq((1000L + i, i.toDouble, 0L)).toDF("k", "v", "p"), "p")
    }
    val q = start(dir, s"$root/ckpt", "ms_adm",
      Map("afterVersion" -> "1", "maxVersionsPerTrigger" -> "1"))
    try {
      q.processAllAvailable()
      val rows = sinkRows("ms_adm")
        .select("k", "_commit_version").as[(Long, Long)].collect().toSeq
      assert(rows.toSet ==
        Set((1001L, 2L), (1002L, 3L), (1003L, 4L)),
        s"anchored stream must carry exactly the post-anchor commits, got $rows")
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches == 3,
        s"admission control must split 3 commits into 3 batches, got $dataBatches")
    } finally q.stop()
  }

  test("maxBytesPerTrigger: a fat commit fills its own trigger; restart keeps parity") {
    val root = newDir()
    val dir = s"$root/tbl"; val ckpt = s"$root/ckpt"
    val out = s"$root/out"
    Manifest.create(spark, dir, base, "p")                            // v1
    Manifest.append(spark, dir,
      Seq((1001L, 1.0, 0L)).toDF("k", "v", "p"), "p")                 // v2 small
    Manifest.append(spark, dir, spark.range(20000, 30000)
      .select($"id".as("k"), ($"id" * 1.0).as("v"),
        ($"id" % 2).as("p")), "p")                                    // v3 FAT
    Manifest.append(spark, dir,
      Seq((1002L, 2.0, 0L)).toDF("k", "v", "p"), "p")                 // v4 small
    def run(opts: Map[String, String]): StreamingQuery = {
      val r = opts.foldLeft(spark.readStream.format("graft-manifest")) {
        case (b, (k, v)) => b.option(k, v)
      }
      r.load(dir).writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
    }
    val opts = Map("afterVersion" -> "1", "maxBytesPerTrigger" -> "4096")
    val q = run(opts)
    try {
      q.processAllAvailable()
      // the 10⁴-row commit must not bundle with the small ones: byte
      // pacing splits the 3-commit backlog into 3 batches (count
      // pacing alone would take all three in one)
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches == 3,
        s"byte pacing must split small/FAT/small into 3 batches, got " +
          s"$dataBatches: ${q.recentProgress.map(_.numInputRows).toSeq}")
    } finally q.stop()
    // paced-restart parity: more commits, a fresh query on the same
    // checkpoint — exact continuation, no drop, no dup
    Manifest.append(spark, dir,
      Seq((1003L, 3.0, 0L)).toDF("k", "v", "p"), "p")                 // v5
    val q2 = run(opts)
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out)
      .groupBy("_commit_version").count()
      .as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 1L, 3L -> 10000L, 4L -> 1L, 5L -> 1L),
      s"paced stream must deliver every post-anchor commit exactly once, got $got")
  }

  test("append mode: fast path streams appends, a rewrite fails loudly pointing at cdc") {
    val root = newDir()
    val dir = s"$root/tbl"
    Manifest.create(spark, dir, base, "p")
    val q = start(dir, s"$root/ckpt", "ms_app", Map("mode" -> "append"))
    try {
      q.processAllAvailable()
      assert(!sinkRows("ms_app").columns.contains("_change"),
        "append mode carries no change column")
      Manifest.append(spark, dir, Seq((300L, 3.0, 1L)).toDF("k", "v", "p"), "p")
      q.processAllAvailable()
      assert(sinkRows("ms_app").where($"_commit_version" === 2L).count() == 1)

      Manifest.delete(spark, dir, Seq((300L, 1L)).toDF("k", "p"), Seq("k"), "p")
      val failed = intercept[Throwable] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else t.toString +: chain(t.getCause)
      val msgs = (chain(failed) ++
        q.exception.toSeq.flatMap(chain)).mkString("\n")
      assert(msgs.contains("cdc"),
        s"a rewrite under append mode must fail pointing at cdc mode, got:\n$msgs")
    } finally q.stop()
  }

  test("paced restart under commit lag: the engine's start offset drives pacing, no stall") {
    // the retention pin advances on Source.commit, which LAGS the
    // engine's own commit log by up to a batch — a paced source that
    // guessed its floor from the pin could offer an offset at or below
    // the committed one after a restart and stall forever. Pacing now
    // rides SupportsAdmissionControl.latestOffset(start, _), where the
    // engine supplies the true start; this pins the restart behavior.
    val root = newDir()
    val dir = s"$root/tbl"; val ckpt = s"$root/ckpt"
    val out = s"$root/out"
    Manifest.create(spark, dir, base, "p")
    def run(): Unit = {
      val q = spark.readStream.format("graft-manifest")
        .option("maxVersionsPerTrigger", "1").load(dir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()                                                // snapshot batch
    Manifest.append(spark, dir, Seq((500L, 5.0, 0L)).toDF("k", "v", "p"), "p")
    run()                                                // one paced batch; pin lags
    (1 to 3).foreach { i =>
      Manifest.append(spark, dir,
        Seq((600L + i, i.toDouble, 1L)).toDF("k", "v", "p"), "p")
    }
    run()
    val got = spark.read.parquet(out)
      .where($"_commit_version" >= 3L).select("k", "_commit_version")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((601L, 3L), (602L, 4L), (603L, 5L)),
      s"the paced restart must catch up across all three commits, got $got")
    assert(spark.read.parquet(out).count() == 6 + 1 + 3,
      "no batch may be dropped or duplicated across the paced restarts")
  }

  test("afterTimestamp anchors at the newest commit at-or-before T (timestampAsOf spelling)") {
    val root = newDir()
    val dir = s"$root/tbl"; val ckpt = s"$root/ckpt"
    Manifest.create(spark, dir, base, "p")
    Manifest.append(spark, dir, Seq((100L, 1.0, 0L)).toDF("k", "v", "p"), "p")
    // a far-future T resolves to the CURRENT tip: the stream starts
    // empty and delivers only what commits after it starts
    val q = spark.readStream.format("graft-manifest")
      .option("afterTimestamp", "99999999999999")
      .load(dir)
      .writeStream.format("memory").queryName("mstream_after_ts")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("mstream_after_ts").count() == 0,
        "history at-or-before the anchor must not replay")
      Manifest.append(spark, dir, Seq((200L, 2.0, 1L)).toDF("k", "v", "p"),
        "p")
      q.processAllAvailable()
      assert(spark.table("mstream_after_ts").select("k").as[Long]
        .collect().toSeq == Seq(200L))
    } finally q.stop()
    // both anchors at once refuse at load time
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-manifest")
        .option("afterVersion", "1").option("afterTimestamp", "0").load(dir)
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("REPLICATION: cdc source into the cdc-apply sink converges B to A across restarts") {
    val root = newDir()
    val a = s"$root/a"; val b = s"$root/b"; val ckpt = s"$root/ckpt"
    Manifest.create(spark, a, base, "p")
    def replicate(): Unit = {
      val q = spark.readStream.format("graft-manifest").load(a)
        .writeStream.format("graft-manifest")
        .option("path", b).option("partitionCol", "p")
        .option("keys", "k").option("cdc", "true")
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    def stateOf(dir: String) = Manifest.read(spark, dir)
      .select("k", "v", "p").as[(Long, Double, Long)].collect().toSet
    replicate() // initial snapshot
    assert(stateOf(b) == stateOf(a))
    Manifest.append(spark, a, Seq((100L, 1.0, 0L)).toDF("k", "v", "p"), "p")
    Manifest.upsert(spark, a, Seq((2L, 222.0, 0L)).toDF("k", "v", "p"),
      Seq("k"), "p") // in-place update (key 2 stays in p=0)
    // a REAL partition move: upsert's contract forbids moves, so key 3
    // relocates p=1 → p=0 as delete + re-insert — the feed then carries
    // the cross-partition delete+insert pair whose old-partition
    // representative applyChanges must keep in its candidate set
    Manifest.delete(spark, a, Seq((3L, 1L)).toDF("k", "p"), Seq("k"), "p")
    Manifest.append(spark, a, Seq((3L, 333.0, 0L)).toDF("k", "v", "p"), "p")
    Manifest.delete(spark, a, Seq((4L, 0L)).toDF("k", "p"), Seq("k"), "p")
    replicate()
    assert(stateOf(b) == stateOf(a),
      "B must converge to A including the partition-moving update")
    assert(Manifest.read(spark, b).where($"k" === 3L).count() == 1,
      "the moved key must not survive as a duplicate in its old partition")
    // a REPLAYED run (same checkpoint, no new commits) must not double-
    // apply anything, and fresh commits after the restart still land
    replicate()
    Manifest.deleteMor(spark, a, Seq((5L, 1L)).toDF("k", "p"), Seq("k"), "p")
    replicate()
    assert(stateOf(b) == stateOf(a))
    assert(Manifest.history(spark, b).select("operation")
      .as[String].collect().count(_ == "APPLY_CHANGES") >= 2,
      "the apply path, not a blind upsert, served the deltas")
    // cdc-specific start refusals carry their own targeted messages
    val e1 = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-manifest").load(a)
        .writeStream.format("graft-manifest")
        .option("path", s"$root/c").option("partitionCol", "p")
        .option("cdc", "true")
        .option("checkpointLocation", s"$root/ckpt_c").start()
    }
    assert(e1.getMessage.contains("keys"))
    val e2 = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-manifest").load(a)
        .writeStream.format("graft-manifest")
        .option("path", s"$root/c").option("partitionCol", "p")
        .option("keys", "k") // keyed upsert, NOT cdc
        .option("mergeSchema", "true")
        .option("checkpointLocation", s"$root/ckpt_c").start()
    }
    assert(e2.getMessage.contains("append path"))
  }

  test("REPLICATION under schema evolution: an upstream ADD COLUMNS folds into the target") {
    val root = newDir()
    val a = s"$root/a"; val b = s"$root/b"; val ckpt = s"$root/ckpt"
    Manifest.create(spark, a, base, "p")
    def replicate(): Unit = {
      val q = spark.readStream.format("graft-manifest").load(a)
        .writeStream.format("graft-manifest")
        .option("path", b).option("partitionCol", "p")
        .option("keys", "k").option("cdc", "true")
        .option("mergeSchema", "true") // opt-in: fold source evolves
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    replicate() // bootstrap at the pre-evolution schema
    // upstream ALTER TABLE ADD COLUMNS, then data under the new schema
    Manifest.evolve(spark, a, Seq("tag" -> "string"))
    Manifest.append(spark, a,
      Seq((100L, 1.0, 0L, "new")).toDF("k", "v", "p", "tag"), "p")
    Manifest.upsert(spark, a,
      Seq((2L, 222.0, 0L, "upd")).toDF("k", "v", "p", "tag"), Seq("k"), "p")
    replicate() // the restart adopts the widened schema; the fold evolves B
    def stateOf(dir: String) = Manifest.read(spark, dir)
      .select("k", "v", "p", "tag")
      .as[(Long, Double, Long, Option[String])].collect().toSet
    assert(stateOf(b) == stateOf(a),
      "B must converge to A across the evolution (old rows null-tagged)")
    assert(Manifest.read(spark, b).where($"tag".isNotNull).count() == 2)
    // restart-replay: same checkpoint, no new commits — no double apply,
    // no second evolve
    replicate()
    assert(stateOf(b) == stateOf(a))
    assert(Manifest.tableSchema(spark, b).fieldNames.count(
      _.equalsIgnoreCase("tag")) == 1)
    // and replication keeps converging beyond the evolution
    Manifest.delete(spark, a, Seq((100L, 0L)).toDF("k", "p"), Seq("k"), "p")
    replicate()
    assert(stateOf(b) == stateOf(a))
  }

  test("REPLICATION under TYPE WIDENING: an upstream int→long widen folds into the target") {
    val root = newDir()
    val a = s"$root/a"; val b = s"$root/b"; val ckpt = s"$root/ckpt"
    // n starts INT; upstream widens it to BIGINT mid-stream
    Manifest.create(spark, a,
      Seq((1L, 10, 0L), (2L, 20, 0L)).toDF("k", "n", "p"), "p")
    assert(Manifest.tableSchema(spark, a)("n").dataType ==
      org.apache.spark.sql.types.IntegerType)
    def replicate(): Unit = {
      val q = spark.readStream.format("graft-manifest").load(a)
        .writeStream.format("graft-manifest")
        .option("path", b).option("partitionCol", "p")
        .option("keys", "k").option("cdc", "true")
        .option("mergeSchema", "true") // opt-in: fold source evolves
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    replicate() // bootstrap at int
    assert(Manifest.tableSchema(spark, b)("n").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // upstream widening ALTER COLUMN TYPE (metadata-only), then data
    // only a LONG can hold — the round-trip the fold must preserve
    Manifest.widenColumn(spark, a, "n", "bigint")
    Manifest.append(spark, a,
      Seq((3L, 5000000000L, 0L)).toDF("k", "n", "p"), "p")
    Manifest.upsert(spark, a,
      Seq((2L, 222L, 0L)).toDF("k", "n", "p"), Seq("k"), "p")
    replicate() // the restart adopts the widened schema; the fold widens B
    def stateOf(dir: String) = Manifest.read(spark, dir)
      .select("k", "n", "p").as[(Long, Long, Long)].collect().toSet
    assert(Manifest.tableSchema(spark, b)("n").dataType ==
      org.apache.spark.sql.types.LongType,
      "the fold must widen B's column, not rewrite data")
    assert(stateOf(b) == stateOf(a),
      "B must converge to A across the widen (old int files read as long)")
    assert(stateOf(b).contains((3L, 5000000000L, 0L)))
    // restart-replay: same checkpoint, no new commits — no double apply
    replicate()
    assert(stateOf(b) == stateOf(a))
    // and replication keeps converging beyond the widen
    Manifest.delete(spark, a, Seq((1L, 0L)).toDF("k", "p"), Seq("k"), "p")
    replicate()
    assert(stateOf(b) == stateOf(a))
  }

  test("REPLICATION across RENAME/DROP: provenance replays as the target's own colmap commits") {
    val root = newDir()
    val a = s"$root/a"; val b = s"$root/b"; val ckpt = s"$root/ckpt"
    Manifest.create(spark, a,
      Seq((1L, 1.0, 0L, "x"), (2L, 2.0, 1L, "y"))
        .toDF("k", "v", "p", "junk"), "p")
    def replicate(): Unit = {
      val q = spark.readStream.format("graft-manifest").load(a)
        .writeStream.format("graft-manifest")
        .option("path", b).option("partitionCol", "p")
        .option("keys", "k").option("cdc", "true")
        .option("mergeSchema", "true")
        .option("replicateSchemaFrom", a) // fold rename/drop provenance
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    replicate() // bootstrap at the original schema
    assert(Manifest.tableSchema(spark, b).fieldNames.toSet ==
      Set("k", "v", "p", "junk"))
    // upstream ALTER TABLE RENAME + DROP (both metadata-only), then
    // data under the new face — the batch arrives with `amount`, which
    // an add-columns fold alone would fork into a brand-new column
    Manifest.renameColumn(spark, a, "v", "amount")
    Manifest.dropColumn(spark, a, "junk")
    Manifest.upsert(spark, a,
      Seq((2L, 222.0, 1L), (3L, 3.0, 0L)).toDF("k", "amount", "p"),
      Seq("k"), "p")
    replicate() // restart adopts the renamed schema; provenance replays
    def stateOf(dir: String) = Manifest.read(spark, dir)
      .select("k", "amount", "p").as[(Long, Double, Long)].collect().toSet
    assert(Manifest.tableSchema(spark, b).fieldNames.toSet ==
      Set("k", "amount", "p"),
      "the target must RENAME v->amount and DROP junk, not fork " +
        "amount as a new null-filled column")
    assert(stateOf(b) == stateOf(a))
    assert(stateOf(b).contains((2L, 222.0, 1L)))
    // the target's own history records the replayed ops — they are
    // its commits, not a side effect smeared into a data batch
    val ops = Manifest.history(spark, b).select("operation")
      .as[String].collect().toSet
    assert(ops.contains("RENAME_COLUMN") && ops.contains("DROP_COLUMN"),
      s"target history must show the replayed colmap ops, got $ops")
    // restart-replay: idempotent — no second rename, no double apply
    replicate()
    assert(stateOf(b) == stateOf(a))
    assert(Manifest.tableSchema(spark, b).fieldNames.count(
      _.equalsIgnoreCase("amount")) == 1)
    // and replication keeps converging beyond the rename
    Manifest.delete(spark, a, Seq((1L, 0L)).toDF("k", "p"), Seq("k"), "p")
    replicate()
    assert(stateOf(b) == stateOf(a))
  }

  test("a mid-stream RENAME fails the fixed-schema conformance loudly, never misreads") {
    val root = newDir()
    val dir = s"$root/tbl"; val ckpt = s"$root/ckpt"
    Manifest.create(spark, dir, base, "p")
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("memory").queryName("mstream_rename")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("mstream_rename").count() == 6)
      // the stream's schema is fixed at load; a rename changes the
      // logical face, so the next batch must refuse — a silent
      // mis-selection would hand rows of the wrong shape downstream
      Manifest.renameColumn(spark, dir, "v", "w")
      Manifest.append(spark, dir, Seq((100L, 1.0, 0L)).toDF("k", "w", "p"),
        "p")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("v") || Option(e.getCause).exists(
        c => Option(c.getMessage).exists(_.contains("v"))),
        s"the failure must name the vanished column, got: ${e.getMessage}")
    } finally q.stop()
    // a RESTARTED stream picks up the renamed schema and replays clean
    val ckpt2 = s"$root/ckpt2"
    val q2 = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("memory").queryName("mstream_rename2")
      .option("checkpointLocation", ckpt2).start()
    try {
      q2.processAllAvailable()
      assert(spark.table("mstream_rename2").columns.contains("w"))
      assert(spark.table("mstream_rename2").count() == 7)
    } finally q2.stop()
  }

  test("cdc across a compaction commit: a pure rewrite nets ZERO change rows") {
    val root = newDir()
    val dir = s"$root/tbl"
    Manifest.create(spark, dir, base, "p")                               // v1
    Manifest.append(spark, dir, Seq((10L, 1.0, 0L)).toDF("k", "v", "p"),
      "p")                                                               // v2
    val q = start(dir, s"$root/ckpt", "ms_compact")
    try {
      q.processAllAvailable()
      val vBefore = Manifest.versions(spark, dir).last
      Manifest.compact(spark, dir, "p", smallBytes = 32L << 20)
      val vAfter = Manifest.versions(spark, dir).last
      assert(vAfter > vBefore, "the compaction must actually commit")
      q.processAllAvailable()
      // the rewrite carried every row unchanged: inserts and deletes
      // cancel in the per-commit diff, so the feed stays SILENT — a
      // consumer never sees a phantom full-table churn from maintenance
      assert(sinkRows("ms_compact")
        .where($"_commit_version" === vAfter).count() == 0,
        "a pure compaction rewrite must net zero change rows")
      Manifest.append(spark, dir, Seq((20L, 2.0, 1L)).toDF("k", "v", "p"),
        "p")
      q.processAllAvailable()
      assert(sinkRows("ms_compact").where($"k" === 20L).count() == 1,
        "the feed must keep flowing after the silent maintenance commit")
    } finally q.stop()
  }

  test("sink: table-to-table streaming ETL, one commit per batch, convergent downstream") {
    val root = newDir()
    val up = s"$root/up"; val down = s"$root/down"
    Manifest.create(spark, up, base, "p")
    // second run drives Trigger.AvailableNow — the batch-scope trigger
    // the rest of the pipeline standardizes on — so both the default
    // and the available-now wrapper paths are exercised
    def run(availableNow: Boolean): Unit = {
      val w = spark.readStream.format("graft-manifest")
        .option("mode", "append").load(up)
        .where($"v" > 1.0)
        .select($"k", ($"v" * 10).as("v10"), $"p")
        .writeStream.format("graft-manifest")
        .option("path", down).option("partitionCol", "p")
        .option("checkpointLocation", s"$root/ckpt")
      if (availableNow) {
        val q = w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try assert(q.awaitTermination(120000),
          "AvailableNow run must self-terminate") finally q.stop()
      } else {
        val q = w.start()
        try q.processAllAvailable() finally q.stop()
      }
    }
    run(availableNow = false)
    Manifest.append(spark, up, Seq((50L, 50.0, 0L)).toDF("k", "v", "p"), "p")
    run(availableNow = true)
    val got = Manifest.read(spark, down).select("k", "v10")
      .as[(Long, Double)].collect().toMap
    val want = Manifest.read(spark, up).where($"v" > 1.0)
      .select($"k", $"v" * 10).as[(Long, Double)].collect().toMap
    assert(got == want,
      s"downstream must equal the transformed upstream, got $got want $want")
    // no duplicate appends across the restart: one row for the v2 commit
    assert(Manifest.read(spark, down).where($"k" === 50L).count() == 1)
  }

  test("sink: update-mode aggregation upserts by key, convergent with the batch aggregate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = newDir()
    val down = s"$root/kpi"
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("k", "v")
      .groupBy($"k").agg(sum($"v").as("total"))
      .select($"k", $"total", ($"k" % 2).as("p"))
      .writeStream.outputMode("update").format("graft-manifest")
      .option("path", down).option("partitionCol", "p")
      .option("keys", "k")
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      mem.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      mem.addData((1L, 10.0), (3L, 3.0))
      q.processAllAvailable()
      val got = Manifest.read(spark, down).select("k", "total")
        .as[(Long, Double)].collect().toMap
      assert(got == Map(1L -> 11.0, 2L -> 2.0, 3L -> 3.0),
        s"keyed upsert sink must fold update-mode re-emissions, got $got")
    } finally q.stop()
  }

  test("sink: a replayed batch id no-ops against the txn marker (exactly-once)") {
    val root = newDir()
    val down = s"$root/tbl"
    val sink = new ManifestSink(spark, down, "p", Seq.empty, Seq.empty,
      mergeSchema = false)
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", "q-replay")
    try {
      sink.addBatch(0L, base)
      sink.addBatch(0L, base) // crash-replay of the same batch
      assert(Manifest.read(spark, down).count() == 6,
        "the replayed batch must not double-append")
      assert(Manifest.lastTxn(spark, down, "q-replay").contains(0L))
      sink.addBatch(1L, Seq((99L, 9.0, 1L)).toDF("k", "v", "p"))
      assert(Manifest.read(spark, down).count() == 7)
    } finally spark.sparkContext.setLocalProperty("sql.streaming.queryId", null)
  }

  test("sink: Complete mode and keyless Update are refused at start") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = newDir()
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val agg = mem.toDF().toDF("k", "v").groupBy($"k")
      .agg(sum($"v").as("total")).select($"k", $"total", ($"k" % 2).as("p"))
    intercept[IllegalArgumentException] {
      agg.writeStream.outputMode("complete").format("graft-manifest")
        .option("path", s"$root/t1").option("partitionCol", "p")
        .option("checkpointLocation", s"$root/ck1").start()
    }
    intercept[IllegalArgumentException] {
      agg.writeStream.outputMode("update").format("graft-manifest")
        .option("path", s"$root/t2").option("partitionCol", "p")
        .option("checkpointLocation", s"$root/ck2").start()
    }
  }

  test("option validation fails at load time; metadata-column collision is refused") {
    val root = newDir()
    val dir = s"$root/tbl"
    Manifest.create(spark, dir, base, "p")
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-manifest").option("mode", "weird").load(dir)
    }
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-manifest")
        .option("maxVersionsPerTrigger", "0").load(dir)
    }
    val cdir = s"$root/ctbl"
    Manifest.create(spark, cdir,
      base.withColumnRenamed("v", "_commit_version"), "p")
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-manifest").load(cdir)
    }
  }
}
