package graft.ops

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge-on-read deletion vectors: deletes/upserts that commit a
  * (file, row-position) mask instead of rewriting candidate files. */
class ManifestDvSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() =
    Files.createTempDirectory("graft-dv").toString + "/tbl"

  private def base = spark.range(1, 101)
    .select($"id".as("k"), ($"id" * 1.0).as("v"),
      ($"id" / 50).cast("long").as("p"))

  private def state(dir: String): Map[Long, (Double, Long)] =
    Manifest.read(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

  private def baseState =
    (1L to 100L).map(k => k -> (k * 1.0, k / 50)).toMap

  private def dataFiles(dir: String): Set[String] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(dir, "data"), true)
    val b = scala.collection.mutable.Set[String]()
    while (it.hasNext) { val st = it.next(); if (st.isFile) b += st.getPath.toString }
    b.toSet
  }

  test("deleteMor masks rows without touching any data file") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    val filesBefore = dataFiles(dir)
    Manifest.deleteMor(spark, dir,
      Seq((7L, 0L), (70L, 1L)).toDF("k", "p"), Seq("k"), "p")
    assert(dataFiles(dir) == filesBefore, "MoR delete must not write data files")
    assert(state(dir) == baseState - 7L - 70L)
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L))
    // time travel: the pre-delete snapshot still shows everything
    assert(Manifest.readVersion(spark, dir, 1L).count() == 100)
  }

  test("re-deleting dead rows is a no-op commit (no duplicate DV rows)") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.deleteMor(spark, dir, Seq((7L, 0L)).toDF("k", "p"), Seq("k"), "p")
    Manifest.deleteMor(spark, dir, Seq((7L, 0L)).toDF("k", "p"), Seq("k"), "p")
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L),
      "a delete that hits nothing must not commit a version")
    assert(state(dir) == baseState - 7L)
  }

  test("upsertMor matches copy-on-write upsert row semantics exactly") {
    val cow = newDir(); val mor = newDir()
    val updates = spark.range(90, 111)
      .select($"id".as("k"), ($"id" * 10.0).as("v"),
        ($"id" / 50).cast("long").as("p"))
    Manifest.create(spark, cow, base, "p")
    Manifest.upsert(spark, cow, updates, Seq("k"), "p")
    Manifest.create(spark, mor, base, "p")
    val filesBefore = dataFiles(mor)
    Manifest.upsertMor(spark, mor, updates, Seq("k"), "p")
    assert(dataFiles(mor).intersect(filesBefore) == filesBefore,
      "MoR upsert must only ADD files")
    assert(state(mor) == state(cow))
    // null update column keeps the target value (coalesce semantics)
    val nullV = Seq((5L, Option.empty[Double], 0L)).toDF("k", "v", "p")
    Manifest.upsertMor(spark, mor, nullV, Seq("k"), "p")
    assert(state(mor)(5L) == ((5.0, 0L)))
  }

  test("copy-on-write rewrite after a MoR delete does not resurrect masked rows") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.deleteMor(spark, dir, Seq((7L, 0L)).toDF("k", "p"), Seq("k"), "p")
    // CoW upsert rewrites the candidate files of partition 0
    Manifest.upsert(spark, dir,
      Seq((8L, 888.0, 0L)).toDF("k", "v", "p"), Seq("k"), "p")
    assert(state(dir) == baseState - 7L + (8L -> (888.0, 0L)))
    // and the DV'd key can be re-inserted afterwards
    Manifest.upsert(spark, dir,
      Seq((7L, 777.0, 0L)).toDF("k", "v", "p"), Seq("k"), "p")
    assert(state(dir)(7L) == ((777.0, 0L)))
  }

  test("materialize folds vectors into files and drops them") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.deleteMor(spark, dir,
      (1L to 10L).map(k => (k, 0L)).toDF("k", "p"), Seq("k"), "p")
    Manifest.materialize(spark, dir, "p")
    assert(state(dir) == baseState -- (1L to 10L))
    assert(Manifest.loadSnapshot(spark, dir).dvDirs.isEmpty)
    // the masked files were rewritten; the untouched partition carried
    val snap = Manifest.loadSnapshot(spark, dir)
    assert(snap.entries.nonEmpty)
    // a second materialize is a no-op (no new version)
    val vs = Manifest.versions(spark, dir)
    Manifest.materialize(spark, dir, "p")
    assert(Manifest.versions(spark, dir) == vs)
  }

  test("compact applies DVs to the small files it rewrites") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.deleteMor(spark, dir, Seq((7L, 0L)).toDF("k", "p"), Seq("k"), "p")
    Manifest.compact(spark, dir, "p", smallBytes = Long.MaxValue,
      targetBytes = Long.MaxValue)
    assert(state(dir) == baseState - 7L)
  }

  test("change feed is DV-aware: exact and signed") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p") // v1
    Manifest.deleteMor(spark, dir,
      Seq((7L, 0L), (70L, 1L)).toDF("k", "p"), Seq("k"), "p") // v2
    Manifest.append(spark, dir,
      Seq((200L, 2.0, 4L)).toDF("k", "v", "p"), "p") // v3

    val feed = Manifest.changes(spark, dir, 1L, 3L)
      .select($"k", $"change").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed == Set((7L, "delete"), (70L, "delete"), (200L, "insert")))

    // signed fold: sum(v * sign) over the feed == table-sum delta
    val signed = Manifest.changesSigned(spark, dir, 1L, 3L)
      .agg(sum($"v" * $"sign")).collect()(0).getDouble(0)
    val before = Manifest.readVersion(spark, dir, 1L)
      .agg(sum($"v")).collect()(0).getDouble(0)
    val after = Manifest.readVersion(spark, dir, 3L)
      .agg(sum($"v")).collect()(0).getDouble(0)
    assert(math.abs(signed - (after - before)) < 1e-9)
  }

  test("change feed across MoR upsert: update surfaces as delete+insert pair") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p") // v1
    Manifest.upsertMor(spark, dir,
      Seq((5L, 555.0, 0L)).toDF("k", "v", "p"), Seq("k"), "p") // v2
    val feed = Manifest.changes(spark, dir, 1L, 2L)
      .select($"k", $"v", $"change").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(feed == Set((5L, 5.0, "delete"), (5L, 555.0, "insert")))
  }

  test("readRange / readPoint / readPartitions honor the mask") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p", statsCols = Seq("v"),
      bloomCols = Seq("k"))
    Manifest.deleteMor(spark, dir, Seq((7L, 0L)).toDF("k", "p"), Seq("k"), "p")
    assert(Manifest.readRange(spark, dir, "v", Some("6.0"), Some("8.0"))
      .select("k").collect().map(_.getLong(0)).toSet == Set(6L, 8L))
    assert(Manifest.readPoint(spark, dir, "k", "7").count() == 0)
    assert(Manifest.readPartitions(spark, dir, "p", Seq("0"))
      .filter($"k" === 7L).count() == 0)
  }

  test("vacuum reclaims DV dirs of dropped versions, keeps live ones") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.deleteMor(spark, dir, Seq((7L, 0L)).toDF("k", "p"), Seq("k"), "p")
    Manifest.materialize(spark, dir, "p") // v3: no DVs
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new Path(dir, "_dv")).nonEmpty)
    Manifest.vacuumOrphans(spark, dir, keepVersions = 1, staleMillis = 0L)
    val left = if (fs.exists(new Path(dir, "_dv")))
      fs.listStatus(new Path(dir, "_dv")).length else 0
    assert(left == 0, s"dead DV dir survived vacuum ($left left)")
    assert(state(dir) == baseState - 7L)

    // and a LIVE vector survives vacuum
    Manifest.deleteMor(spark, dir, Seq((8L, 0L)).toDF("k", "p"), Seq("k"), "p")
    Manifest.vacuumOrphans(spark, dir, keepVersions = 1, staleMillis = 0L)
    assert(state(dir) == baseState - 7L - 8L)
  }

  test("keyed writes bloom-prune their candidate files inside one partition") {
    val dir = newDir()
    // 4 files with disjoint key ranges, ONE partition value: partition
    // pruning is useless here, only the per-file key blooms can narrow
    def slab(lo: Long): org.apache.spark.sql.DataFrame =
      spark.range(lo, lo + 100)
        .select($"id".as("k"), ($"id" * 1.0).as("v"), lit(0L).as("p"))
    Manifest.create(spark, dir, slab(0), "p", bloomCols = Seq("k"))
    Seq(100L, 200L, 300L).foreach(lo => Manifest.append(spark, dir, slab(lo), "p"))
    val before = Manifest.loadSnapshot(spark, dir).entries.map(_.path).toSet
    assert(before.size == 4)

    // CoW delete of one key: only the file that can hold it is rewritten
    Manifest.delete(spark, dir, Seq((150L, 0L)).toDF("k", "p"), Seq("k"), "p")
    val after = Manifest.loadSnapshot(spark, dir).entries.map(_.path).toSet
    val carried = before.intersect(after)
    assert(carried.size >= 2,
      s"bloom prune kept only ${carried.size} of 4 files untouched")
    assert(Manifest.read(spark, dir).count() == 399)

    // and a MoR upsert through the same prune stays correct
    Manifest.upsertMor(spark, dir,
      Seq((250L, 999.0, 0L)).toDF("k", "v", "p"), Seq("k"), "p")
    assert(Manifest.read(spark, dir).filter($"k" === 250L)
      .select("v").collect().map(_.getDouble(0)).toSeq == Seq(999.0))
    assert(Manifest.read(spark, dir).count() == 399)

    // a batch whose key TYPE differs from the table's (Int vs Long)
    // must still delete: the probe hashes in the TABLE's type — an
    // untyped probe would bloom-miss every file and silently skip rows
    Manifest.deleteMor(spark, dir,
      Seq((351, 0)).toDF("k", "p"), Seq("k"), "p")
    assert(Manifest.read(spark, dir).filter($"k" === 351L).count() == 0)

    // a null key in the batch fails open (no pruning), matches nothing
    Manifest.delete(spark, dir,
      Seq((Option.empty[Long], Some(0L))).toDF("k", "p"), Seq("k"), "p")
    assert(Manifest.read(spark, dir).count() == 398)
  }

  test("manifests written before a ManifestEntry field existed stay readable") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    // simulate an OLD-WRITER manifest: rewrite the manifest relation
    // without the newest sentinel columns
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mDir = fs.listStatus(new Path(dir, "_manifests")).head.getPath
    val legacy = spark.read.parquet(mDir.toString)
      .drop("constraints", "dv_dirs")
    val tmp = new Path(dir, "_legacy_manifest")
    legacy.write.parquet(tmp.toString)
    fs.delete(mDir, true)
    assert(fs.rename(tmp, mDir))

    // every read path resolves the missing fields to their defaults
    assert(state(dir) == baseState)
    assert(Manifest.loadSnapshot(spark, dir).dvDirs.isEmpty)
    assert(Manifest.constraintsOf(spark, dir).isEmpty)
    Manifest.deleteMor(spark, dir, Seq((7L, 0L)).toDF("k", "p"), Seq("k"), "p")
    assert(state(dir) == baseState - 7L)
  }

  test("timestamp stats prune zone-free: write in UTC, query in another zone") {
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val dir = newDir()
      def band(day: String): org.apache.spark.sql.DataFrame =
        spark.range(1, 301).select($"id".as("k"),
          to_timestamp(concat(lit(s"$day "),
            format_string("%02d:%02d:00", ($"id" / 60).cast("int"),
              ($"id" % 60).cast("int")))).as("ts"),
          ($"id" % 4).as("p"))
      Manifest.create(spark, dir, band("1995-01-01"), "p",
        statsCols = Seq("ts"))
      Manifest.append(spark, dir, band("1995-06-01"), "p")

      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      // 1995-05-31 16:00 LA == 1995-05-31 23:00 UTC: only band B matches
      val scanned = graft.plans.ManifestScan.scan(spark, dir)
        .filter($"ts" >= "1995-05-31 16:00:00")
      assert(scanned.count() == 300)
      val viaRange = Manifest.readRange(spark, dir, "ts",
        Some("1995-05-31 16:00:00"), None)
      assert(viaRange.count() == 300)
      // and the cross-zone read PRUNES (1 of 2 band files opened)
      assert(Manifest.rangeCandidatePaths(spark, dir, "ts",
        Some("1995-05-31 16:00:00"), None).size == 1)
      // keyed delete on a TIMESTAMP-partitioned table stays sound
      // cross-zone (value-set pruning is disabled for that type)
      val dir2 = newDir()
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      Manifest.create(spark, dir2,
        band("1995-01-01").select($"k", ($"k" * 1.0).as("v"), $"ts"), "ts")
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      Manifest.delete(spark, dir2,
        Manifest.read(spark, dir2).filter($"k" === 7L).select($"k", $"ts"),
        Seq("k"), "ts")
      assert(Manifest.read(spark, dir2).filter($"k" === 7L).count() == 0)
      assert(Manifest.read(spark, dir2).count() == 299)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("maintain: folds DVs past the threshold, compacts, vacuums — one call") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.append(spark, dir, Seq((200L, 2.0, 4L)).toDF("k", "v", "p"), "p")
    Manifest.deleteMor(spark, dir,
      (1L to 10L).map(k => (k, 0L)).toDF("k", "p"), Seq("k"), "p")
    val counts = Manifest.maintain(spark, dir, "p",
      smallBytes = Long.MaxValue, targetBytes = Long.MaxValue,
      dvFileFrac = 0.0, keepVersions = 1, staleMillis = 0L)
    assert(counts("materialized_files") >= 1)
    assert(counts("vacuumed_objects") > 0)
    assert(Manifest.loadSnapshot(spark, dir).dvDirs.isEmpty)
    assert(state(dir) == baseState -- (1L to 10L) + (200L -> (2.0, 4L)))
    // below the threshold nothing materializes
    Manifest.deleteMor(spark, dir, Seq((11L, 0L)).toDF("k", "p"), Seq("k"), "p")
    // threshold > 1 is unreachable (the table is one file post-compact)
    val counts2 = Manifest.maintain(spark, dir, "p",
      smallBytes = 0L, dvFileFrac = 2.0, keepVersions = 10,
      staleMillis = 0L)
    assert(counts2("materialized_files") == 0)
    assert(Manifest.loadSnapshot(spark, dir).dvDirs.nonEmpty)
    assert(state(dir) == baseState -- (1L to 11L) + (200L -> (2.0, 4L)))
  }

  test("describeHistory: one row per version with files/rows/DV/txn shape") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.deleteMor(spark, dir, Seq((7L, 0L)).toDF("k", "p"), Seq("k"), "p")
    Manifest.appendIfAbsent(spark, dir,
      Seq((300L, 3.0, 4L)).toDF("k", "v", "p"), "p", "feeder", 9L)
    val h = Manifest.describeHistory(spark, dir)
      .orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(h(0).getLong(2) == 100 && h(2).getLong(2) == 101) // file rows
    assert(h(0).getLong(4) == 0 && h(1).getLong(4) == 1) // dv_dirs
    assert(h(2).getString(6) == "txn:feeder:9")
  }

  test("describeHistory parity: chain-derived counts equal each version's own snapshot") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.append(spark, dir,
      Seq((300L, 3.0, 4L)).toDF("k", "v", "p"), "p") // linked add
    Manifest.deleteMor(spark, dir,
      Seq((7L, 0L)).toDF("k", "p"), Seq("k"), "p") // DV attach
    Manifest.upsert(spark, dir,
      Seq((8L, 88.0, 0L)).toDF("k", "v", "p"), Seq("k"), "p") // removes
    Manifest.renameColumn(spark, dir, "v", "amount") // re-root
    Manifest.compact(spark, dir, "p", smallBytes = 1L << 30)
    Manifest.overwrite(spark, dir,
      Seq((1L, 1.0, 0L), (2L, 2.0, 1L)).toDF("k", "amount", "p"), "p")
    Manifest.restore(spark, dir, 3L)
    val got = Manifest.describeHistory(spark, dir)
      .orderBy("version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // independent recomputation: the full per-version snapshot (the
    // shape the pre-chain implementation collected per version)
    val want = Manifest.versions(spark, dir).map { v =>
      val s = Manifest.loadSnapshot(spark, dir, Some(v))
      (v, s.entries.size.toLong, s.entries.map(_.rows).sum,
        s.entries.map(_.bytes).sum, s.dvDirs.size.toLong,
        s.constraints.size.toLong)
    }
    assert(got.toSeq == want,
      s"chain-derived history diverged from the snapshot recomputation")
  }

  test("planner scan masks DV'd rows and still prunes by stats") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p", statsCols = Seq("v"))
    Manifest.deleteMor(spark, dir, Seq((7L, 0L)).toDF("k", "p"), Seq("k"), "p")
    val scanned = graft.plans.ManifestScan.scan(spark, dir, Some("p"))
    assert(scanned.count() == 99)
    assert(scanned.filter($"k" === 7L).count() == 0)
  }

  test("empty upsert over fully-DV-masked candidates no-ops (code-review finding)") {
    // a TIMESTAMP partition column makes candidate selection unscoped
    // (unsafe rendering → EVERY live entry is a candidate), so an empty
    // batch still has nonempty candidates; MoR-delete every row so the
    // masked target is empty too. The merged full outer is then empty
    // with a nonempty candidate list — the empty-write guard must probe
    // the MERGE, not infer emptiness from (cands, batch).
    val dir = newDir()
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Manifest.create(spark, dir,
      Seq((1L, 1.0, ts), (2L, 2.0, ts)).toDF("k", "v", "p"), "p")
    Manifest.deleteMor(spark, dir,
      Seq((1L, ts), (2L, ts)).toDF("k", "p"), Seq("k"), "p")
    val empty = Seq.empty[(Long, Double, java.sql.Timestamp)]
      .toDF("k", "v", "p")
    Manifest.upsert(spark, dir, empty, Seq("k"), "p") // must not crash
    assert(Manifest.read(spark, dir).count() == 0)
  }
}
