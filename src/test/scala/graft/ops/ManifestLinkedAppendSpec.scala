package graft.ops

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.DistributedManifestFileIndex

/** The O(batch) LINKED append commit: a steady appender must not pay
  * O(table entries) driver heap per commit (a 10⁷-entry snapshot is
  * ~4 GB collected — the ceiling a streaming ingest hits first). An
  * eligible append stages only its batch's entries plus a `_graft_base`
  * pointer; readers resolve the chain as one relation. These specs pin
  * the layout, read parity across every consumer venue, the compaction
  * triggers (chain cap / mergeSchema / legacy physical schema), vacuum's
  * chain closure, and the loud-failure contract for a corrupt base. */
class ManifestLinkedAppendSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() = Files.createTempDirectory("graft-linked").toString + "/tbl"

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def base = spark.range(1, 101)
    .select($"id".as("k"), ($"id" * 1.0).as("v"),
      ($"id" / 50).cast("long").as("p"))

  private def batch(k: Long, p: Long) = Seq((k, k * 1.0, p)).toDF("k", "v", "p")

  private def tipManifest(dir: String): Path = {
    val fs = fsOf(dir)
    val v = Manifest.versions(spark, dir).last
    val in = fs.open(new Path(dir, f"_versions/v$v%08d"))
    val name = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().next().trim finally in.close()
    new Path(dir, s"_manifests/$name")
  }

  private def hasBase(dir: String): Boolean =
    fsOf(dir).exists(new Path(tipManifest(dir), "_graft_base"))

  test("append links: O(batch) manifest + base pointer, full read parity") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p", statsCols = Seq("v"))
    (1 to 3).foreach(i => Manifest.append(spark, dir, batch(200L + i, 4L), "p"))
    assert(hasBase(dir), "an eligible append must stage a linked manifest")
    // the tip dir carries ONLY the batch's entries (O(batch), no sentinel)
    val tipRows = spark.read.parquet(tipManifest(dir).toString)
      .select("path", "schema_ddl").collect()
    assert(tipRows.length == 1 && tipRows.forall(r =>
      r.getString(0).nonEmpty && r.getString(1).isEmpty))
    // read parity: latest + time travel through every version
    assert(Manifest.read(spark, dir).count() == 103)
    assert(Manifest.readVersion(spark, dir, 2L).count() == 101)
    assert(Manifest.read(spark, dir).agg(sum("k")).as[Long].head() ==
      (1L to 100L).sum + 201 + 202 + 203)
    // stats pruning still prunes ACROSS the chain: v bounds live on
    // each entry, old files cannot satisfy v > 200
    val idx = new DistributedManifestFileIndex(spark, dir, Some("p"))
    val attr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "v", org.apache.spark.sql.types.DoubleType)()
    val pred = org.apache.spark.sql.catalyst.expressions.GreaterThan(attr,
      org.apache.spark.sql.catalyst.expressions.Literal(200.5))
    val all = idx.listFiles(Nil, Nil).head.files.size
    assert(idx.candidateCount(Seq(pred)) < all,
      "stat bounds on linked entries must keep pruning")
  }

  test("chain cap compacts: tip re-roots as a self-contained manifest") {
    val dir = newDir()
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setLong(Manifest.AppendMaxChainKey, 3L)
    try {
      Manifest.create(spark, dir, base, "p", statsCols = Seq("v"))
      (1 to 2).foreach(i => Manifest.append(spark, dir, batch(300L + i, 4L), "p"))
      assert(hasBase(dir), "below the cap appends link")
      Manifest.append(spark, dir, batch(310L, 4L), "p") // chain at cap → compact
      assert(!hasBase(dir), "at the cap the append compacts (re-roots)")
      // the compacted manifest is complete and keeps the table config
      val rows = spark.read.parquet(tipManifest(dir).toString)
        .select("path", "schema_ddl", "stat_cols").collect()
      val (sent, files) = rows.partition(_.getString(0).isEmpty)
      assert(sent.length == 1 && sent.head.getSeq[String](2) == Seq("v"))
      assert(files.length.toLong ==
        Manifest.read(spark, dir).inputFiles.length)
      assert(Manifest.read(spark, dir).count() == 103)
      // and the next append links onto the NEW root
      Manifest.append(spark, dir, batch(320L, 4L), "p")
      assert(hasBase(dir))
      assert(Manifest.read(spark, dir).count() == 104)
    } finally hconf.unset(Manifest.AppendMaxChainKey)
  }

  test("mergeSchema widening compacts; old rows read the new column as null") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.append(spark, dir, batch(201L, 4L), "p")
    assert(hasBase(dir))
    Manifest.append(spark, dir,
      Seq((500L, 5.0, 4L, "x")).toDF("k", "v", "p", "tag"), "p",
      mergeSchema = true)
    assert(!hasBase(dir), "a schema-widening append must compact")
    val out = Manifest.read(spark, dir)
    assert(out.columns.toSeq == Seq("k", "v", "p", "tag"))
    assert(out.filter($"tag".isNull).count() == 101)
    assert(out.filter($"tag" === "x").count() == 1)
  }

  test("legacy parent (old physical manifest schema) compacts instead of linking") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    // simulate an OLD-WRITER manifest: strip the newest sentinel columns
    val fs = fsOf(dir)
    val mDir = tipManifest(dir)
    val legacy = spark.read.parquet(mDir.toString)
      .drop("constraints", "dv_dirs")
    val tmp = new Path(dir, "_legacy_manifest")
    legacy.write.parquet(tmp.toString)
    fs.delete(mDir, true)
    assert(fs.rename(tmp, mDir))
    Manifest.append(spark, dir, batch(201L, 4L), "p")
    assert(!hasBase(dir),
      "mixing physical parquet schemas in one chain would leave schema " +
        "inference to footer sampling — the append must compact")
    assert(Manifest.read(spark, dir).count() == 101)
  }

  test("corrupt base pointer fails loudly — never a silent partial listing") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.append(spark, dir, batch(201L, 4L), "p")
    val fs = fsOf(dir)
    val bp = new Path(tipManifest(dir), "_graft_base")
    fs.delete(bp, false)
    val out = fs.create(bp, true)
    try out.write("garbage".getBytes("UTF-8")) finally out.close()
    val err = intercept[IllegalArgumentException] {
      Manifest.read(spark, dir).count()
    }
    assert(err.getMessage.contains("corrupt"))
  }

  test("vacuum keeps every base of a kept tip; a compacted chain reclaims") {
    val dir = newDir()
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setLong(Manifest.AppendMaxChainKey, 4L)
    try {
      Manifest.create(spark, dir, base, "p")
      (1 to 2).foreach(i => Manifest.append(spark, dir, batch(200L + i, 4L), "p"))
      val fs = fsOf(dir)
      val before = fs.listStatus(new Path(dir, "_manifests")).length
      assert(before == 3)
      // keep only the tip: its chain (all 3 manifests) must survive
      Manifest.vacuumOrphans(spark, dir, keepVersions = 1, staleMillis = 0L)
      assert(fs.listStatus(new Path(dir, "_manifests")).length == 3,
        "every base of the kept tip is live")
      assert(Manifest.read(spark, dir).count() == 102)
      // compact (cap reached), vacuum again: the old chain is garbage
      (3 to 4).foreach(i => Manifest.append(spark, dir, batch(200L + i, 4L), "p"))
      assert(!hasBase(dir))
      Manifest.vacuumOrphans(spark, dir, keepVersions = 1, staleMillis = 0L)
      assert(fs.listStatus(new Path(dir, "_manifests")).length == 1,
        "a re-rooted tip frees its predecessors")
      assert(Manifest.read(spark, dir).count() == 104)
    } finally hconf.unset(Manifest.AppendMaxChainKey)
  }

  test("tail replay rides linked commits: checkpoint + linked tail, parity") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.checkpoint(spark, dir, partitionCol = Some("p"))
    (1 to 2).foreach(i => Manifest.append(spark, dir, batch(400L + i, 4L), "p"))
    assert(hasBase(dir))
    val idx = new DistributedManifestFileIndex(spark, dir, Some("p"))
    assert(idx.usesTailReplay,
      "linked commits still write the delta sidecars the replay folds")
    val listed = idx.listFiles(Nil, Nil).head.files.size
    assert(listed == Manifest.read(spark, dir).inputFiles.length)
  }

  test("partition overwrite links too: O(touched) commit, removes in the base") {
    val dir = newDir()
    // SCD2 shape: per-partition batches (partition-PURE files — hash
    // clustering can co-locate values, which would make untouched
    // files spanning rewrite candidates), live partition 2 rewritten
    Manifest.create(spark, dir, base.filter($"p" === 0), "p")
    Manifest.append(spark, dir, base.filter($"p" === 1), "p")
    Manifest.append(spark, dir, base.filter($"p" === 2), "p")
    // which physical file holds each partition (row-level filters do
    // not prune inputFiles, so resolve via input_file_name)
    val fileOf = Manifest.read(spark, dir)
      .select($"p", input_file_name().as("f")).distinct()
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Manifest.overwritePartitions(spark, dir,
      Seq((900L, 9.0, 2L), (901L, 9.1, 2L)).toDF("k", "v", "p"), "p")
    assert(hasBase(dir), "a safe-rendering partition overwrite links")
    // the base file carries the dropped files as removes
    val fs = fsOf(dir)
    val in = fs.open(new Path(tipManifest(dir), "_graft_base"))
    val baseLines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    assert(baseLines.count(_.startsWith("remove:")) >= 1)
    assert(baseLines.last.startsWith("end:"))
    // read parity: partition 2 fully replaced, others untouched —
    // and untouched files carried BY REFERENCE (same physical paths)
    val out = Manifest.read(spark, dir)
    assert(out.filter($"p" === 2).select("k").as[Long].collect().sorted
      .toSeq == Seq(900L, 901L))
    assert(out.filter($"p" < 2).count() == base.filter($"p" < 2).count())
    val after = out.inputFiles.toSet
    assert(after.contains(fileOf(0L)) && after.contains(fileOf(1L)),
      "untouched partitions' files are carried by reference")
    assert(!after.contains(fileOf(2L)), "the replaced file is dropped")
    // time travel still sees the pre-overwrite partition 2
    assert(Manifest.readVersion(spark, dir, 3L)
      .filter($"p" === 2).count() == base.filter($"p" === 2).count())
  }

  test("a torn base file (lost remove line) fails loudly, never resurrects") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.overwritePartitions(spark, dir,
      Seq((900L, 9.0, 2L)).toDF("k", "v", "p"), "p")
    val fs = fsOf(dir)
    val bp = new Path(tipManifest(dir), "_graft_base")
    val in = fs.open(bp)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    // drop one remove line but keep the stale trailer — a torn write
    val torn = lines.filterNot(_.startsWith("remove:")).dropRight(1) ++
      lines.takeRight(1)
    val out = fs.create(bp, true)
    try out.write(torn.mkString("\n").getBytes("UTF-8")) finally out.close()
    val err = intercept[IllegalArgumentException] {
      Manifest.read(spark, dir).count()
    }
    assert(err.getMessage.contains("corrupt"))
  }

  test("vacuum reclaims overwritten data files; chain manifests stay live") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    val replaced = Manifest.read(spark, dir)
      .filter($"p" === 2).inputFiles.toSet
    Manifest.overwritePartitions(spark, dir,
      Seq((900L, 9.0, 2L)).toDF("k", "v", "p"), "p")
    Manifest.vacuumOrphans(spark, dir, keepVersions = 1, staleMillis = 0L)
    val fs = fsOf(dir)
    replaced.foreach(f => assert(!fs.exists(new Path(f.stripPrefix("file:"))),
      s"overwritten file must be reclaimed: $f"))
    assert(Manifest.read(spark, dir).filter($"p" === 2)
      .select("k").as[Long].head() == 900L)
    assert(Manifest.read(spark, dir).count() ==
      base.filter($"p" < 2).count() + 1)
  }

  test("MoR delete/upsert ride the chain as dv: lines — no sentinel rewrite") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.append(spark, dir, batch(201L, 4L), "p")
    // MoR delete: kilobytes of vector, O(batch) commit
    Manifest.deleteMor(spark, dir,
      Seq((5L, 0L), (201L, 4L)).toDF("k", "p"), Seq("k"), "p")
    assert(hasBase(dir))
    val fs = fsOf(dir)
    val in = fs.open(new Path(tipManifest(dir), "_graft_base"))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    assert(lines.count(_.startsWith("dv:")) == 1,
      "the DV attach is a chain line, not a sentinel rewrite")
    // no manifest part was written at all for the pure-DV commit
    assert(!fs.listStatus(tipManifest(dir)).exists(st =>
      st.isFile && !st.getPath.getName.startsWith("_")))
    val out = Manifest.read(spark, dir)
    assert(out.count() == 99)
    assert(out.filter($"k".isin(5L, 201L)).isEmpty)
    // time travel: pre-delete rows still visible
    assert(Manifest.readVersion(spark, dir, 2L).count() == 101)
    // MoR upsert on top: new files + a second vector, still linked
    Manifest.upsertMor(spark, dir,
      Seq((10L, 99.0, 0L), (300L, 3.0, 4L)).toDF("k", "v", "p"),
      Seq("k"), "p")
    assert(hasBase(dir))
    val out2 = Manifest.read(spark, dir)
    assert(out2.count() == 100) // 99 - masked 10 + updated 10 + new 300
    assert(out2.filter($"k" === 10L).select("v").as[Double].head() == 99.0)
    assert(out2.filter($"k" === 300L).count() == 1)
    // materialize folds the chain's vectors and re-roots (full manifest)
    assert(Manifest.materialize(spark, dir, "p") > 0L)
    assert(!hasBase(dir))
    val out3 = Manifest.read(spark, dir)
    assert(out3.count() == 100)
    assert(out3.filter($"k" === 10L).select("v").as[Double].head() == 99.0)
    // vacuum keeps nothing stranded: read still exact afterwards
    Manifest.vacuumOrphans(spark, dir, keepVersions = 1, staleMillis = 0L)
    assert(Manifest.read(spark, dir).count() == 100)
  }

  test("CoW upsert/delete over a linked chain: carried files untouched") {
    val dir = newDir()
    Manifest.create(spark, dir, base.filter($"p" === 0), "p")
    Manifest.append(spark, dir, base.filter($"p" === 1), "p")
    val fileOf = Manifest.read(spark, dir)
      .select($"p", input_file_name().as("f")).distinct()
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // keyed upsert touching only partition 1
    Manifest.upsert(spark, dir,
      Seq((60L, 60.5, 1L), (999L, 9.9, 1L)).toDF("k", "v", "p"),
      Seq("k"), "p")
    assert(hasBase(dir))
    val out = Manifest.read(spark, dir)
    assert(out.filter($"k" === 60L).select("v").as[Double].head() == 60.5)
    assert(out.filter($"k" === 999L).count() == 1)
    assert(out.count() == base.filter($"p" < 2).count() + 1)
    assert(out.inputFiles.contains(fileOf(0L)),
      "the untouched partition's file is carried by reference")
    assert(!out.inputFiles.contains(fileOf(1L)),
      "the rewritten candidate is dropped via the chain's remove set")
    // keyed delete, same shape
    Manifest.delete(spark, dir, Seq((999L, 1L)).toDF("k", "p"),
      Seq("k"), "p")
    assert(hasBase(dir))
    assert(Manifest.read(spark, dir).count() ==
      base.filter($"p" < 2).count())
  }

  test("exactly-once txn markers ride the linked commit pointer") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    assert(Manifest.appendIfAbsent(spark, dir, batch(201L, 4L), "p", "app", 1L))
    assert(hasBase(dir))
    assert(!Manifest.appendIfAbsent(spark, dir, batch(201L, 4L), "p", "app", 1L),
      "a replayed batch no-ops")
    assert(Manifest.read(spark, dir).count() == 101)
  }

  test("chain-aware change diff: transient add+remove inside the range nets out (endpoint parity)") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")                               // v1
    Manifest.append(spark, dir,
      Seq((500L, 5.0, 0L), (501L, 5.1, 0L)).toDF("k", "v", "p"), "p")    // v2
    Manifest.delete(spark, dir,
      Seq((500L, 0L), (501L, 0L)).toDF("k", "p"), Seq("k"), "p")         // v3
    assert(hasBase(dir), "the range must be a linked chain (fast path)")
    // rows added at v2 and deleted at v3 are invisible at the
    // endpoints; the delete's CoW rewrite of sibling candidates is a
    // remove+add of identical rows that cancels in the multiset diff —
    // the fast chain diff must agree with the endpoint anti-joins: NOTHING
    assert(Manifest.changes(spark, dir, 1L, 3L).count() == 0,
      "an intra-range transient file must net to zero change rows")
    // and a surviving append past the churn surfaces exactly itself
    Manifest.append(spark, dir, Seq((600L, 6.0, 1L)).toDF("k", "v", "p"),
      "p")                                                               // v4
    val net = Manifest.changes(spark, dir, 1L, 4L)
      .select("k", "change").as[(Long, String)].collect().toSet
    assert(net == Set((600L, "insert")),
      s"only the surviving row may appear across the whole range, got $net")
  }
}
