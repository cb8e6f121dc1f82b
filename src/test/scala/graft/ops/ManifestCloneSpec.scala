package graft.ops

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Local fs that refuses every write under `_pins/` — the read-only
  * source bucket/mount shape: a clone must fall back to the documented
  * coordinate-retention caveat (warn + skip pinning), not fail. */
class PinRefusingFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "ropinfs"
  override def getUri: java.net.URI = java.net.URI.create("ropinfs:///")
  override def create(p: Path, overwrite: Boolean)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    if (p.toUri.getPath.contains("/_pins/"))
      throw new java.io.IOException(
        s"read-only filesystem (injected): cannot write $p")
    super.create(p, overwrite)
  }
  override def mkdirs(p: Path): Boolean = {
    if (p.toUri.getPath.endsWith("/_pins"))
      throw new java.io.IOException(
        s"read-only filesystem (injected): cannot mkdir $p")
    super.mkdirs(p)
  }
}

/** SHALLOW CLONE ([[Manifest.shallowClone]]): a metadata-only fork —
  * the clone's v1 lists the source's data files by reference through
  * the `_ext` batch-dir map (zero data copied), deletion vectors copy
  * (kilobytes), and from its first commit the clone is an independent
  * table whose writes never touch the source. */
class ManifestCloneSpec extends SparkSpec {
  import spark.implicits._

  private def newDir(tag: String) =
    Files.createTempDirectory(s"graft-clone-$tag").toString + "/tbl"

  private def base = spark.range(1, 101)
    .select($"id".as("k"), ($"id" * 1.0).as("v"),
      ($"id" % 4).as("p"))

  private def state(dir: String): Map[Long, Double] =
    Manifest.read(spark, dir).select("k", "v")
      .as[(Long, Double)].collect().toMap

  private def baseState = (1L until 101L).map(k => k -> k * 1.0).toMap

  private def dataFiles(dir: String): Set[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(root, "data"))) return Set.empty
    val it = fs.listFiles(new Path(root, "data"), true)
    val b = scala.collection.mutable.Set[String]()
    while (it.hasNext) {
      val st = it.next(); if (st.isFile) b += st.getPath.toString
    }
    b.toSet
  }

  test("clone reads as the source snapshot with ZERO data files copied") {
    val src = newDir("src"); val dst = newDir("dst")
    Manifest.create(spark, src, base, "p", statsCols = Seq("v"))
    Manifest.append(spark, src,
      Seq((200L, 200.0, 0L)).toDF("k", "v", "p"), "p")
    Manifest.shallowClone(spark, src, dst)
    assert(dataFiles(dst).isEmpty, "a shallow clone must copy no data")
    assert(state(dst) == state(src))
    assert(Manifest.versions(spark, dst) == Seq(1L),
      "the clone's history starts fresh at v1")
    // version pin: clone of v1 sees only the pre-append source
    val dst1 = newDir("dstv1")
    Manifest.shallowClone(spark, src, dst1, version = Some(1L))
    assert(state(dst1) == baseState)
    // an existing table refuses
    intercept[IllegalArgumentException] {
      Manifest.shallowClone(spark, src, dst)
    }
  }

  test("stats pruning carries: a ranged read of the clone skips external files") {
    val src = newDir("psrc"); val dst = newDir("pdst")
    // two appends with disjoint v ranges: stats separate them
    Manifest.create(spark, src,
      spark.range(0, 50).select($"id".as("k"), ($"id" * 1.0).as("v"),
        lit(0L).as("p")), "p", statsCols = Seq("v"))
    Manifest.append(spark, src,
      spark.range(100, 150).select($"id".as("k"), ($"id" * 1.0).as("v"),
        lit(0L).as("p")), "p")
    Manifest.shallowClone(spark, src, dst)
    def opened(df: org.apache.spark.sql.DataFrame): Long =
      df.select(col("_metadata.file_path")).distinct().count()
    val all = opened(Manifest.read(spark, dst))
    val pruned = Manifest.read(spark, dst).filter($"v" >= 100.0)
    assert(opened(pruned) < all,
      "the clone must prune on the carried stats")
    assert(pruned.count() == 50)
  }

  test("writes on the clone never touch the source; rewrites retire external refs") {
    val src = newDir("wsrc"); val dst = newDir("wdst")
    Manifest.create(spark, src, base, "p", statsCols = Seq("v"))
    val srcFiles = dataFiles(src)
    Manifest.shallowClone(spark, src, dst)
    // append lands locally
    Manifest.append(spark, dst,
      Seq((500L, 500.0, 1L)).toDF("k", "v", "p"), "p")
    // keyed rewrite of partition 2: its external files retire, the
    // rewritten rows land locally — the source is untouched throughout
    Manifest.upsert(spark, dst,
      Seq((2L, -2.0, 2L)).toDF("k", "v", "p"), Seq("k"), "p")
    Manifest.deleteWhere(spark, dst, "k = 7", "p")
    assert(dataFiles(src) == srcFiles, "the source must never change")
    assert(state(src) == baseState)
    assert(state(dst) ==
      baseState + (500L -> 500.0) + (2L -> -2.0) - 7L)
    // OPTIMIZE makes the clone fully self-contained (un-clone)
    Manifest.compact(spark, dst, "p",
      smallBytes = Long.MaxValue, targetBytes = Long.MaxValue)
    val ins = Manifest.read(spark, dst).inputFiles
    assert(ins.nonEmpty && ins.forall(_.contains(new Path(dst).toUri.getPath)),
      s"after a full rewrite every live file must be clone-local")
    assert(state(dst) ==
      baseState + (500L -> 500.0) + (2L -> -2.0) - 7L)
  }

  test("MoR on the clone: deletion vectors mask EXTERNAL files; source DVs copy") {
    val src = newDir("msrc"); val dst = newDir("mdst")
    Manifest.create(spark, src, base, "p")
    // a source-side DV, present at clone time: must copy and keep masking
    Manifest.deleteMor(spark, src, Seq((9L, 1L)).toDF("k", "p"),
      Seq("k"), "p")
    Manifest.shallowClone(spark, src, dst)
    assert(state(dst) == baseState - 9L)
    // a CLONE-side MoR delete masks rows that live in SOURCE files —
    // the DV keys on the root-independent path tail
    Manifest.deleteMor(spark, dst, Seq((10L, 2L)).toDF("k", "p"),
      Seq("k"), "p")
    assert(dataFiles(dst).isEmpty, "MoR on the clone writes no data file")
    assert(state(dst) == baseState - 9L - 10L)
    assert(state(src) == baseState - 9L, "the source keeps its own mask only")
    // folding the source's vectors later must not affect the clone
    Manifest.materialize(spark, src, "p")
    assert(state(dst) == baseState - 9L - 10L)
    // CoW rewrite on the clone folds its mask without resurrecting
    Manifest.upsert(spark, dst, Seq((11L, -11.0, 3L)).toDF("k", "v", "p"),
      Seq("k"), "p")
    assert(state(dst) == baseState - 9L - 10L + (11L -> -11.0))
  }

  test("clone of a clone chains to the ORIGINAL roots; vacuum on the clone spares them") {
    val a = newDir("a"); val b = newDir("b"); val c = newDir("c")
    Manifest.create(spark, a, base, "p")
    Manifest.shallowClone(spark, a, b)
    Manifest.append(spark, b, Seq((300L, 3.0, 0L)).toDF("k", "v", "p"), "p")
    Manifest.shallowClone(spark, b, c)
    assert(state(c) == baseState + (300L -> 3.0))
    // c references a's files DIRECTLY (and b's append under b) — b's
    // own external map chains through, never an intermediary hop
    val aFiles = dataFiles(a)
    // vacuum on the clones must never reclaim another root's files
    Manifest.vacuumOrphans(spark, c, keepVersions = 1, staleMillis = 0L)
    Manifest.vacuumOrphans(spark, b, keepVersions = 1, staleMillis = 0L)
    assert(dataFiles(a) == aFiles, "vacuum on a clone must spare the source")
    assert(state(c) == baseState + (300L -> 3.0))
  }

  test("a crashed half-clone is overwritten by the retry (no nested DV copies, stale _ext)") {
    val src = newDir("xsrc"); val dst = newDir("xdst")
    Manifest.create(spark, src, base, "p")
    Manifest.deleteMor(spark, src, Seq((9L, 1L)).toDF("k", "p"),
      Seq("k"), "p")
    val fs = new Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dvName = new Path(src).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(new Path(src, "_dv")).head.getPath.getName
    // simulate a clone that crashed mid-copy: a half/nested DV dir and
    // a stale _ext landed, but no version pointer ever did
    fs.mkdirs(new Path(dst, s"_dv/$dvName/$dvName"))
    val out = fs.create(new Path(dst, "_ext"), true)
    out.write("b-dead-beef=file:/nowhere\n".getBytes("UTF-8"))
    out.close()
    Manifest.shallowClone(spark, src, dst)
    assert(state(dst) == baseState - 9L,
      "the retry must supersede every half-written artifact")
  }

  test("the change feed and incremental reads work over a cloned history") {
    val src = newDir("fsrc"); val dst = newDir("fdst")
    Manifest.create(spark, src, base, "p")
    Manifest.shallowClone(spark, src, dst)
    Manifest.append(spark, dst, Seq((400L, 4.0, 0L)).toDF("k", "v", "p"), "p")
    Manifest.deleteWhere(spark, dst, "k <= 2", "p")
    val feed = Manifest.changes(spark, dst, 1L, 3L)
      .select("k", "change").as[(Long, String)].collect().toSet
    assert(feed == Set((400L, "insert"), (1L, "delete"), (2L, "delete")),
      s"got $feed")
  }

  test("a live clone PINS its source: vacuum refuses; forced vacuum breaks loudly") {
    val src = newDir("psrc"); val dst = newDir("pdst")
    Manifest.create(spark, src, base, "p")
    Manifest.shallowClone(spark, src, dst)
    assert(Manifest.pins(spark, src).exists(_._1.startsWith("clone-")),
      "the clone must register a retention pin on its source")
    // move the source PAST the cloned snapshot: a whole-table update
    // retires every v1 file, so an unpinned vacuum would reclaim the
    // exact files the clone still lists
    Manifest.updateWhere(spark, src, Seq("v" -> "v + 1"), "true", "p")
    intercept[Manifest.RetentionPinnedException] {
      Manifest.vacuumOrphans(spark, src, keepVersions = 1, staleMillis = 0L)
    }
    assert(state(dst) == baseState, "the refused vacuum reclaimed nothing")
    // FORCE overrides the pin — and then the clone's next read fails
    // LOUDLY (unresolvable data files), never silently
    Manifest.vacuumOrphans(spark, src, keepVersions = 1, staleMillis = 0L,
      force = true)
    intercept[Exception] { state(dst) }
  }

  test("a self-contained clone releases its source pins; maintain auto-releases") {
    val src = newDir("rsrc"); val dst = newDir("rdst")
    Manifest.create(spark, src, base, "p")
    Manifest.shallowClone(spark, src, dst)
    assert(Manifest.pins(spark, src).size == 1)
    // while the clone still references the source, release is a no-op
    assert(Manifest.releaseCloneSourcePins(spark, dst) == 0L)
    assert(Manifest.pins(spark, src).size == 1)
    // a whole-table rewrite retires every external reference; the next
    // maintenance pass releases the pin and the source vacuums freely
    Manifest.updateWhere(spark, dst, Seq("v" -> "v"), "true", "p")
    val m = Manifest.maintain(spark, dst, "p", keepVersions = 1,
      staleMillis = 0L)
    assert(m("released_source_pins") == 1L, s"got $m")
    assert(Manifest.pins(spark, src).isEmpty)
    Manifest.append(spark, src, Seq((500L, 5.0, 0L)).toDF("k", "v", "p"), "p")
    Manifest.vacuumOrphans(spark, src, keepVersions = 1, staleMillis = 0L)
    assert(state(dst) == baseState, "the released clone is self-contained")
  }

  test("clone-of-a-clone pins the ORIGINAL at the intermediate's anchor") {
    val a = newDir("ga"); val b = newDir("gb"); val c = newDir("gc")
    Manifest.create(spark, a, base, "p")
    Manifest.shallowClone(spark, a, b)
    val anchorOnA = Manifest.pins(spark, a).values.head
    Manifest.shallowClone(spark, b, c)
    val pinsOnA = Manifest.pins(spark, a)
    assert(pinsOnA.size == 2, s"grand-clone must pin the original: $pinsOnA")
    assert(pinsOnA.values.toSet == Set(anchorOnA),
      "the grand-clone reuses the intermediate's anchor version")
    // dropping the INTERMEDIATE (force-release + delete) keeps the
    // grand-clone protected: its own pin on the original survives
    Manifest.releaseCloneSourcePins(spark, b, force = true)
    assert(Manifest.pins(spark, a).size == 1)
    Manifest.updateWhere(spark, a, Seq("v" -> "v + 1"), "true", "p")
    intercept[Manifest.RetentionPinnedException] {
      Manifest.vacuumOrphans(spark, a, keepVersions = 1, staleMillis = 0L)
    }
    assert(state(c) == baseState)
  }

  test("a re-clone to the same dst never RAISES an existing pin anchor (min wins)") {
    val src = newDir("minsrc"); val dst = newDir("mindst")
    Manifest.create(spark, src, base, "p")
    Manifest.append(spark, src, Seq((200L, 200.0, 0L)).toDF("k", "v", "p"),
      "p")
    Manifest.shallowClone(spark, src, dst) // anchors at v2
    val (pinName, anchor) = Manifest.pins(spark, src).head
    assert(anchor == 2L)
    // the dst dies (crash cleanup / test teardown), the source moves
    // on, and a new clone lands at the SAME dst path — the shared
    // deterministic pin name must keep the LOWER anchor: raising it
    // would let a source vacuum reclaim files a racing same-dst winner
    // (which anchored lower) still lists
    val fs = new Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dst), true)
    Manifest.append(spark, src, Seq((300L, 300.0, 1L)).toDF("k", "v", "p"),
      "p")
    Manifest.shallowClone(spark, src, dst) // would anchor at v3
    assert(Manifest.pins(spark, src) == Map(pinName -> 2L),
      "the existing lower anchor must survive the second clone")
    assert(state(dst) == state(src))
  }

  test("clone from a read-only source (pin write refused) proceeds UNPINNED with the caveat") {
    val local = newDir("rosrc")
    spark.sparkContext.hadoopConfiguration.set("fs.ropinfs.impl",
      classOf[PinRefusingFileSystem].getName)
    val src = s"ropinfs://$local"
    Manifest.create(spark, src, base, "p")
    val dst = newDir("rodst")
    // the pin write throws IOException on this scheme; the clone must
    // fall back to the old coordinate-retention caveat instead of
    // failing — and end fully readable
    Manifest.shallowClone(spark, src, dst)
    assert(Manifest.pins(spark, src).isEmpty,
      "no pin can exist on the read-only source")
    assert(state(dst) == baseState)
  }
}
