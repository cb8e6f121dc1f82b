package graft.ops

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CONVERT-IN-PLACE ([[Manifest.convert]]): adopt an existing
  * plain-parquet directory as a manifest table with ZERO bytes
  * rewritten — the 100 TB onboarding path (Delta's CONVERT TO DELTA).
  * The load-bearing assertions: no file is copied into the table root;
  * every write path (append, CoW rewrite, merge-on-read DVs, compact)
  * works on the adopted files, including the rel-path derivation that
  * keys deletion vectors; a full rewrite leaves the table
  * self-contained; and the table's own vacuum never touches the
  * adopted files. */
class ManifestConvertSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot(tag: String) =
    Files.createTempDirectory(s"graft-convert-$tag").toString

  private def base = spark.range(0, 100)
    .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" % 4).as("p"))

  private def mkParquet(dir: String, parts: Int = 4): Unit =
    base.repartition(parts).write.parquet(dir)

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

  private def state(dir: String): Map[Long, Double] =
    Manifest.read(spark, dir).select("k", "v")
      .as[(Long, Double)].collect().toMap

  private def baseState = (0L until 100L).map(k => k -> k * 1.0).toMap

  test("convert adopts the files by reference: zero data copied, reads exact, stats prune") {
    val root = newRoot("adopt")
    val pdir = s"$root/raw"; val dir = s"$root/tbl"
    mkParquet(pdir)
    val n = Manifest.convert(spark, dir, pdir, "p", statsCols = Seq("k"))
    assert(n >= 2L, s"expected several adopted files, got $n")
    assert(dataFiles(dir).isEmpty, "convert must copy no data")
    assert(Manifest.versions(spark, dir) == Seq(1L))
    assert(state(dir) == baseState)
    // the converted stats prune: a narrow k-range opens few files
    val scan = graft.plans.ManifestScan.scan(spark, dir, Some("p"))
      .where($"k" >= 10 && $"k" <= 12)
    assert(scan.as[(Long, Double, Long)].collect().map(_._1).toSet ==
      Set(10L, 11L, 12L))
    // partition value sets carried: a p filter prunes via the exact tier
    assert(graft.plans.ManifestScan.scan(spark, dir, Some("p"))
      .where($"p" === 1).count() == 25L)
  }

  test("the converted table is fully live: append, CoW delete, MoR delete, compact to self-contained") {
    val root = newRoot("live")
    val pdir = s"$root/raw"; val dir = s"$root/tbl"
    mkParquet(pdir)
    Manifest.convert(spark, dir, pdir, "p")
    // append lands a LOCAL batch
    Manifest.append(spark, dir, Seq((500L, 500.0, 0L)).toDF("k", "v", "p"),
      "p")
    assert(dataFiles(dir).nonEmpty)
    assert(state(dir) == baseState + (500L -> 500.0))
    // merge-on-read delete: the DV must mask rows INSIDE adopted files
    // (this is the raw-path rel derivation working end to end)
    Manifest.deleteWhereMor(spark, dir, "k % 10 = 3", "p")
    val afterMor = state(dir)
    assert(!afterMor.contains(3L) && !afterMor.contains(93L) &&
      afterMor.contains(4L) && afterMor.size == 91)
    // CoW predicate delete rewrites the touched adopted files locally
    Manifest.deleteWhere(spark, dir, "k >= 90 AND k <= 99", "p")
    assert(state(dir).size == 82)
    // compact folds DVs and retires every external reference
    Manifest.compact(spark, dir, "p")
    assert(state(dir).size == 82)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // fully self-contained now: deleting the SOURCE no longer matters
    fs.delete(new Path(pdir), true)
    assert(state(dir).size == 82,
      "a compacted convert must no longer reference the source dir")
  }

  test("vacuum on the converted table never deletes adopted source files") {
    val root = newRoot("vac")
    val pdir = s"$root/raw"; val dir = s"$root/tbl"
    mkParquet(pdir)
    val fs = new Path(pdir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def srcCount = fs.listStatus(new Path(pdir))
      .count(st => st.isFile && !st.getPath.getName.startsWith("_"))
    val before = srcCount
    Manifest.convert(spark, dir, pdir, "p")
    // rewrite everything (retires all external refs), then vacuum hard
    Manifest.updateWhere(spark, dir, Seq("v" -> "v"), "true", "p")
    Manifest.vacuumOrphans(spark, dir, keepVersions = 1, staleMillis = 0L)
    assert(srcCount == before,
      "the adopted files live outside the table root and must survive")
    assert(state(dir) == baseState)
  }

  test("merge with non-partition ON keys probes adopted files correctly") {
    val root = newRoot("mrg")
    val pdir = s"$root/raw"; val dir = s"$root/tbl"
    mkParquet(pdir)
    Manifest.convert(spark, dir, pdir, "p")
    val src = Seq((3L, 333.0), (500L, 500.0)).toDF("mk", "mv")
    val m = Manifest.mergeClauses(spark, dir, src,
      on = Seq("k" -> "mk"), partitionCol = "p",
      matched = Seq(MergeClause.Matched(
        MergeClause.Update(Seq("v" -> "s.mv")))),
      notMatched = Seq(MergeClause.NotMatched(Seq(
        "k" -> "s.mk", "v" -> "s.mv", "p" -> "0"))))
    assert(m("rows_updated") == 1L && m("rows_inserted") == 1L)
    val st = state(dir)
    assert(st(3L) == 333.0 && st(500L) == 500.0 && st.size == 101)
  }

  test("a shallow clone of a converted table carries the raw refs, pins nothing on them") {
    val root = newRoot("clone")
    val pdir = s"$root/raw"; val dir = s"$root/tbl"
    val dst = s"$root/clone"
    mkParquet(pdir)
    Manifest.convert(spark, dir, pdir, "p")
    // one LOCAL batch too, so the clone references both kinds
    Manifest.append(spark, dir, Seq((500L, 500.0, 0L)).toDF("k", "v", "p"),
      "p")
    Manifest.shallowClone(spark, dir, dst)
    assert(state(dst) == baseState + (500L -> 500.0))
    assert(dataFiles(dst).isEmpty)
    // the raw dir got no _pins dir (a plain dir has no manifest to pin)
    val fs = new Path(pdir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(pdir, "_pins")))
    // the MANIFEST source did get the clone pin for its local batch
    assert(Manifest.pins(spark, dir).exists(_._1.startsWith("clone-")))
  }

  test("refusals: existing table, missing column, nesting, staged _ext leftover") {
    val root = newRoot("refuse")
    val pdir = s"$root/raw"; mkParquet(pdir)
    Manifest.convert(spark, s"$root/t2", pdir, "p")
    val e2 = intercept[IllegalArgumentException] {
      Manifest.convert(spark, s"$root/t2", pdir, "p")
    }
    assert(e2.getMessage.contains("already exists"))
    val e3 = intercept[IllegalArgumentException] {
      Manifest.convert(spark, s"$root/t3", pdir, "nope")
    }
    assert(e3.getMessage.contains("not in the converted schema"))
    // table root nested inside the source (either way) refuses
    val e4 = intercept[IllegalArgumentException] {
      Manifest.convert(spark, s"$pdir/tbl", pdir, "p")
    }
    assert(e4.getMessage.contains("must not nest"))
    // a crashed convert's staged _ext (no committed table) refuses
    // loudly instead of silently overwriting
    val fs = new Path(root.toString).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$root/t5"))
    val out = fs.create(new Path(s"$root/t5/_ext"), true)
    out.write("b-dead=raw:/nowhere\n".getBytes("UTF-8")); out.close()
    val e5 = intercept[IllegalArgumentException] {
      Manifest.convert(spark, s"$root/t5", pdir, "p")
    }
    assert(e5.getMessage.contains("_ext already exists"))
  }

  test("a file whose NAME contains '=' is just a file, not a Hive layout") {
    val root = newRoot("eqname")
    val pdir = s"$root/raw"; val dir = s"$root/tbl"
    base.coalesce(1).write.parquet(pdir)
    val fs = new Path(pdir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val f = fs.listStatus(new Path(pdir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .head.getPath
    assert(fs.rename(f, new Path(pdir, "part-0=retry.parquet")))
    assert(Manifest.convert(spark, dir, pdir, "p") == 1L)
    assert(state(dir) == baseState)
  }

  // ---- Hive-partitioned layouts: dir names ARE the partition column

  private def hiveState(dir: String): Map[Long, Long] =
    Manifest.read(spark, dir).select("k", "p")
      .as[(Long, Long)].collect().toMap

  test("hive convert: dir-derived column injected exactly, DML-live, DV masking keys adopted files") {
    val root = newRoot("hive")
    val pdir = s"$root/hive"; val dir = s"$root/tbl"
    base.write.partitionBy("p").parquet(pdir)
    val n = Manifest.convert(spark, dir, pdir, "p", statsCols = Seq("k"))
    assert(n >= 4L)
    assert(dataFiles(dir).isEmpty, "hive convert must copy no data")
    // the directory-derived column reads back exactly (typed long, as
    // Spark's own discovery infers it)
    assert(hiveState(dir) == (0L until 100L).map(k => k -> k % 4).toMap)
    assert(state(dir) == baseState)
    // exact partition pruning via entry value sets (readPartitions)
    assert(Manifest.readPartitions(spark, dir, "p", Seq("1")).count() == 25L)
    // MoR delete: DVs must mask rows inside adopted hive files
    Manifest.deleteWhereMor(spark, dir, "p = 2 AND k < 50", "p")
    val afterMor = hiveState(dir)
    assert(afterMor.size == 100 - 12 && !afterMor.contains(2L) &&
      afterMor.contains(54L))
    // append + CoW rewrite: local files carry the column IN-DATA and
    // coexist with path-derived adopted files in one scan (note the
    // discovery-inferred INT type for the dir-derived column)
    Manifest.append(spark, dir, Seq((500L, 500.0, 7)).toDF("k", "v", "p"),
      "p")
    assert(hiveState(dir)(500L) == 7L)
    Manifest.updateWhere(spark, dir, Seq("v" -> "v + 1000.0"),
      "p = 3", "p")
    val vs = Manifest.read(spark, dir).select("k", "v")
      .as[(Long, Double)].collect().toMap
    assert(vs(3L) == 1003.0 && vs(4L) == 4.0)
    // time travel back to the adopted v1 still injects
    assert(Manifest.readVersion(spark, dir, 1L)
      .where($"p" === 2).count() == 25L)
  }

  test("hive convert: escaped values and __HIVE_DEFAULT_PARTITION__ nulls round-trip") {
    val root = newRoot("hiveesc")
    val pdir = s"$root/hive"; val dir = s"$root/tbl"
    val df = Seq((1L, "a b"), (2L, "x=y%z"), (3L, "c+d"), (4L, null))
      .toDF("k", "s")
    df.write.partitionBy("s").parquet(pdir)
    Manifest.convert(spark, dir, pdir, "s")
    val got = Manifest.read(spark, dir).select("k", "s")
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("a b"), 2L -> Some("x=y%z"),
      3L -> Some("c+d"), 4L -> None), s"got $got")
  }

  test("hive convert: multi-level layout injects every level; mixed depth refuses") {
    val root = newRoot("hive2")
    val pdir = s"$root/hive"; val dir = s"$root/tbl"
    base.withColumn("q", ($"k" % 2).cast("long"))
      .write.partitionBy("p", "q").parquet(pdir)
    Manifest.convert(spark, dir, pdir, "p")
    val got = Manifest.read(spark, dir).select("k", "p", "q")
      .as[(Long, Long, Long)].collect()
    assert(got.length == 100 &&
      got.forall { case (k, p, q) => p == k % 4 && q == k % 2 })
    // mixed plain/hive directory levels refuse loudly
    val mixed = s"$root/mixed"
    base.where($"p" === 0).write.parquet(s"$mixed/x/p=0")
    base.where($"p" === 1).write.parquet(s"$mixed/x/p=1")
    val e = intercept[Exception] {
      Manifest.convert(spark, s"$root/tmix", mixed, "p")
    }
    assert(e.getMessage.contains("col=value") ||
      e.getMessage.contains("Conflicting"), s"got: ${e.getMessage}")
  }

  test("a shallow clone of a hive-converted table keeps the injection spec") {
    val root = newRoot("hiveclone")
    val pdir = s"$root/hive"; val dir = s"$root/tbl"
    val dst = s"$root/clone"
    base.write.partitionBy("p").parquet(pdir)
    Manifest.convert(spark, dir, pdir, "p")
    Manifest.shallowClone(spark, dir, dst)
    assert(hiveState(dst) == (0L until 100L).map(k => k -> k % 4).toMap)
  }

  test("time travel across post-convert writes reaches the adopted v1") {
    val root = newRoot("tt")
    val pdir = s"$root/raw"; val dir = s"$root/tbl"
    mkParquet(pdir)
    Manifest.convert(spark, dir, pdir, "p")
    Manifest.delete(spark, dir, Seq((1L, 1L)).toDF("k", "p"), Seq("k"), "p")
    assert(state(dir).size == 99)
    assert(Manifest.readVersion(spark, dir, 1L).count() == 100L)
    // the change feed diffs converted -> rewritten versions exactly
    val ch = Manifest.changes(spark, dir, 1L, 2L)
    assert(ch.where($"change" === "delete").select($"k").as[Long]
      .collect().toSet == Set(1L))
  }
}
