package graft.ops

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** RESTORE: metadata-only rollback to a retained version as a new
  * commit — snapshot reuse, the undo change feed, vacuum's shared-
  * manifest refcount, and writes on top of a restore. */
class ManifestRestoreSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() = Files.createTempDirectory("graft-restore").toString

  private def base = spark.range(1, 7)
    .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" % 2).as("p"))

  private def state(dir: String, ver: Option[Long] = None): Map[Long, Double] = {
    val df = ver.map(Manifest.readVersion(spark, dir, _))
      .getOrElse(Manifest.read(spark, dir))
    df.select("k", "v").as[(Long, Double)].collect().toMap
  }

  private def manifestDirs(dir: String): Set[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(root, "_manifests")).map(_.getPath.getName).toSet
  }

  test("restore rolls back to the retained version as a new commit, O(1) metadata-only") {
    val dir = newDir() + "/tbl"
    Manifest.create(spark, dir, base, "p")                               // v1
    Manifest.append(spark, dir, Seq((100L, 1.0, 0L)).toDF("k", "v", "p"),
      "p")                                                               // v2
    Manifest.delete(spark, dir, Seq((1L, 1L)).toDF("k", "p"), Seq("k"),
      "p")                                                               // v3
    val v1State = state(dir, Some(1L))

    val before = manifestDirs(dir)
    val nv = Manifest.restore(spark, dir, 1L)
    assert(nv == 4L, s"restore must commit a NEW version, got v$nv")
    assert(manifestDirs(dir) == before,
      "restore must write NO new manifest — the pointer names v1's verbatim")

    assert(state(dir) == v1State, "the tip must read as v1 again")
    assert(state(dir, Some(3L)).get(1L).isEmpty,
      "the pre-restore tip must stay time-travelable")

    // the undo diff: rows v3 deleted reappear as inserts, v2's append leaves
    val undo = Manifest.changes(spark, dir, 3L, 4L)
      .select("k", "change").as[(Long, String)].collect().toSet
    assert(undo == Set((1L, "insert"), (100L, "delete")),
      s"changes(tip, restored) must be the row-level undo, got $undo")
  }

  test("the undo feed surfaces DV-RESURRECTED rows as inserts (restore across a MoR delete)") {
    val dir = newDir() + "/tbl"
    Manifest.create(spark, dir, base, "p")                               // v1
    Manifest.deleteMor(spark, dir, Seq((2L, 0L), (5L, 1L)).toDF("k", "p"),
      Seq("k"), "p")                                                     // v2 (DV only)
    // the restore drops v2's vector while CARRYING every file — the
    // entry diff is empty, so without the dv-removal mirror the feed
    // would read as "no change" and every downstream (streaming CDC,
    // incremental views) would silently miss the resurrection
    Manifest.restore(spark, dir, 1L)                                     // v3
    val undo = Manifest.changes(spark, dir, 2L, 3L)
      .select("k", "change").as[(Long, String)].collect().toSet
    assert(undo == Set((2L, "insert"), (5L, "insert")),
      s"restore across a MoR delete must feed the resurrected rows, got $undo")
    // signed feed: same rows, +1
    val signed = Manifest.changesSigned(spark, dir, 2L, 3L)
      .select("k", "sign").as[(Long, Long)].collect().toSet
    assert(signed == Set((2L, 1L), (5L, 1L)))
    // a row still masked at the range END must NOT resurrect: delete
    // k=3 with a NEW vector, then diff from the v2 state — k=3 stays
    // dead even though v2's vector is gone
    Manifest.deleteMor(spark, dir, Seq((3L, 1L)).toDF("k", "p"),
      Seq("k"), "p")                                                     // v4
    val mixed = Manifest.changes(spark, dir, 2L, 4L)
      .select("k", "change").as[(Long, String)].collect().toSet
    assert(mixed == Set((2L, "insert"), (5L, "insert"), (3L, "delete")),
      s"still-masked rows must not resurrect, got $mixed")
    // appendedBetween must refuse the fast path across a DV removal
    assert(Manifest.appendedBetween(spark, dir, 2L, 3L).isEmpty,
      "a DV-removing range is not append-only")
  }

  test("restore to the tip is a no-op; unretained versions refuse loudly") {
    val dir = newDir() + "/tbl"
    Manifest.create(spark, dir, base, "p")
    assert(Manifest.restore(spark, dir, 1L) == 1L)
    assert(Manifest.versions(spark, dir) == Seq(1L),
      "no empty commit for a no-op restore")
    val err = intercept[IllegalArgumentException] {
      Manifest.restore(spark, dir, 99L)
    }
    assert(err.getMessage.contains("not retained"))
  }

  test("restore resurrects MoR deletion vectors and accepts writes on top") {
    val dir = newDir() + "/tbl"
    Manifest.create(spark, dir, base, "p")                               // v1
    Manifest.deleteMor(spark, dir, Seq((2L, 0L)).toDF("k", "p"),
      Seq("k"), "p")                                                     // v2 (DV)
    Manifest.append(spark, dir, Seq((200L, 2.0, 0L)).toDF("k", "v", "p"),
      "p")                                                               // v3
    val v2State = state(dir, Some(2L))
    assert(Manifest.restore(spark, dir, 2L) == 4L)
    assert(state(dir) == v2State,
      "the restored snapshot must keep v2's deletion vector masking k=2")

    Manifest.append(spark, dir, Seq((300L, 3.0, 1L)).toDF("k", "v", "p"),
      "p")                                                               // v5
    assert(state(dir) == v2State + (300L -> 3.0),
      "writes on top of a restore must chain normally")
  }

  test("vacuum after restore: the shared manifest and its files survive the original pointer") {
    val dir = newDir() + "/tbl"
    Manifest.create(spark, dir, base, "p")                               // v1
    Manifest.append(spark, dir, Seq((100L, 1.0, 0L)).toDF("k", "v", "p"),
      "p")                                                               // v2
    Manifest.delete(spark, dir, Seq((1L, 1L)).toDF("k", "p"), Seq("k"),
      "p")                                                               // v3
    val v1State = state(dir, Some(1L))
    assert(Manifest.restore(spark, dir, 1L) == 4L)

    // keepVersions = 1 drops v1..v3's POINTERS — the restored tip's
    // manifest is v1's by name, and must survive their removal
    Manifest.vacuumOrphans(spark, dir, keepVersions = 1, staleMillis = 0L)
    assert(Manifest.versions(spark, dir) == Seq(4L))
    assert(state(dir) == v1State,
      "the restored tip must stay fully readable after vacuum")
  }
}
