package graft.ops

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Predicate DELETE (`DELETE FROM t WHERE p`) planned in three tiers
  * from the manifest's own metadata: provably-full files drop
  * METADATA-ONLY (zero bytes read — pinned here by deleting the
  * victims' bytes from disk first), provably-clean files are carried by
  * reference untouched (pinned by file-list identity), and only the
  * straddlers are read — rewritten (CoW [[Manifest.deleteWhere]]) or
  * masked by one deletion vector (MoR [[Manifest.deleteWhereMor]]). */
class ManifestDeleteWhereSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() =
    Files.createTempDirectory("graft-delw").toString + "/tbl"

  /** One append per partition value, so every data file carries exactly
    * one recorded partition value — the deterministic layout for
    * pinning the exact (value-set) tier. */
  private def perPartitionTable(dir: String, ps: Seq[Long]): Unit = {
    def slice(p: Long) = spark.range(p * 100, p * 100 + 100)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), lit(p).as("p"))
    Manifest.create(spark, dir, slice(ps.head), "p", statsCols = Seq("v"))
    ps.tail.foreach(p => Manifest.append(spark, dir, slice(p), "p"))
  }

  private def keys(dir: String): Set[Long] =
    Manifest.read(spark, dir).select("k").as[Long].collect().toSet

  /** The snapshot's DATA file paths (normalized; DV relations a masked
    * plan also lists are excluded). */
  private def files(dir: String): Set[String] =
    Manifest.read(spark, dir).inputFiles
      .map(f => new Path(f).toUri.getPath)
      .filter(_.contains("/data/")).toSet

  /** Physically delete the data files holding partition values in
    * `ps` — a later read of any of them would throw, so a passing
    * delete PINS that the tier never opened them. */
  private def dropBytes(dir: String, ps: Set[Long]): Unit = {
    val victims = Manifest.read(spark, dir)
      .withColumn("__f", col("_metadata.file_path"))
      .filter(col("p").isin(ps.toSeq: _*))
      .select("__f").distinct().as[String].collect()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    victims.foreach(f => assert(fs.delete(new Path(f), false)))
  }

  test("partition-predicate retention delete drops whole partitions metadata-only") {
    val dir = newDir()
    perPartitionTable(dir, Seq(0L, 1L, 2L, 3L))
    val before = files(dir)
    val coldFiles = Manifest.read(spark, dir)
      .withColumn("__f", col("_metadata.file_path"))
      .filter(col("p") >= 2).select("__f").distinct().as[String].collect()
      .map(f => new Path(f).toUri.getPath).toSet
    // the victims' BYTES are gone before the delete: only a
    // metadata-only plan can succeed from here
    dropBytes(dir, Set(0L, 1L))
    val out = Manifest.deleteWhere(spark, dir, "p <= 1", "p")
    assert(out("files_rewritten") == 0L, "exact tier must not rewrite")
    assert(out("files_dropped") == (before -- coldFiles).size)
    assert(keys(dir) == (200L until 400L).toSet)
    // untouched partitions carried by reference: identical file paths
    assert(files(dir) == coldFiles)
    // time travel still resolves (entries are metadata; bytes are gone)
    assert(Manifest.versions(spark, dir).size == 5)
  }

  test("date-typed retention predicate takes the exact tier (rendering round-trip)") {
    val dir = newDir()
    def slice(day: Int) = spark.range(0, 50)
      .select(($"id" + day * 1000).as("k"),
        lit(java.sql.Date.valueOf(f"2024-01-${day}%02d")).as("d"))
    Manifest.create(spark, dir, slice(1), "d")
    Seq(2, 3).foreach(day => Manifest.append(spark, dir, slice(day), "d"))
    dropBytes2(dir, col("d") < lit(java.sql.Date.valueOf("2024-01-03")))
    val out = Manifest.deleteWhere(spark, dir,
      "d < DATE '2024-01-03'", "d")
    assert(out("files_rewritten") == 0L)
    assert(out("files_dropped") > 0L)
    assert(Manifest.read(spark, dir).select("k").as[Long].collect().toSet ==
      (3000L until 3050L).toSet)
  }

  /** [[dropBytes]] for an arbitrary victim predicate. */
  private def dropBytes2(dir: String, victim: org.apache.spark.sql.Column): Unit = {
    val victims = Manifest.read(spark, dir)
      .withColumn("__f", col("_metadata.file_path"))
      .filter(victim).select("__f").distinct().as[String].collect()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    victims.foreach(f => assert(fs.delete(new Path(f), false)))
  }

  test("stats tier: provably-clean files untouched, straddlers rewritten row-level") {
    val dir = newDir()
    // two appends with DISJOINT v ranges inside one partition value:
    // the min/max stats alone separate clean files from straddlers
    val lo = spark.range(0, 100)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), lit(0L).as("p"))
    val hi = spark.range(100, 200)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), lit(0L).as("p"))
    Manifest.create(spark, dir, lo, "p", statsCols = Seq("v"))
    Manifest.append(spark, dir, hi, "p")
    val loFiles = Manifest.read(spark, dir)
      .withColumn("__f", col("_metadata.file_path"))
      .filter(col("v") < 100).select("__f").distinct().as[String].collect()
      .map(f => new Path(f).toUri.getPath).toSet
    val out = Manifest.deleteWhere(spark, dir, "v >= 150.0", "p")
    assert(out("files_dropped") == 0L,
      "min/max stats cannot prove FULL (no null counts)")
    assert(out("files_rewritten") > 0L)
    assert(keys(dir) == (0L until 150L).toSet)
    // the lo files' stats prove no match: carried by reference
    assert(loFiles.subsetOf(files(dir)),
      "provably-clean files must carry by reference")
  }

  test("stats tier proves FULL under a NOT NULL constraint: whole files drop unread") {
    val dir = newDir()
    val lo = spark.range(0, 100)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), lit(0L).as("p"))
    val hi = spark.range(100, 200)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), lit(0L).as("p"))
    Manifest.create(spark, dir, lo, "p", statsCols = Seq("v"))
    Manifest.append(spark, dir, hi, "p")
    Manifest.addConstraint(spark, dir, "v_nn", "v IS NOT NULL")
    // the hi file's min/max refute `NOT (v >= 100)` and the constraint
    // proves null-freedom: it must drop with its BYTES already gone
    dropBytes2(dir, col("v") >= 100)
    val out = Manifest.deleteWhere(spark, dir, "v >= 100.0", "p")
    assert(out("files_dropped") > 0L && out("files_rewritten") == 0L,
      s"expected a stats-tier metadata-only drop, got $out")
    assert(keys(dir) == (0L until 100L).toSet)

    // WITHOUT the constraint the same shape must stay a rewrite — the
    // stats carry no null counts, so FULL cannot be proven
    val dir2 = newDir()
    Manifest.create(spark, dir2, lo, "p", statsCols = Seq("v"))
    Manifest.append(spark, dir2, hi, "p")
    val out2 = Manifest.deleteWhere(spark, dir2, "v >= 100.0", "p")
    assert(out2("files_dropped") == 0L && out2("files_rewritten") > 0L)
    assert(keys(dir2) == (0L until 100L).toSet)

    // a null-INTRODUCING predicate (nullif) must disable the tier even
    // under the constraint: nullif(v,150.0) IS NULL keeps k=150, so a
    // FULL drop of its file would be wrong
    val dir3 = newDir()
    Manifest.create(spark, dir3, lo, "p", statsCols = Seq("v"))
    Manifest.append(spark, dir3, hi, "p")
    Manifest.addConstraint(spark, dir3, "v_nn", "v IS NOT NULL")
    val out3 = Manifest.deleteWhere(spark, dir3,
      "nullif(v, 150.0) >= 100.0", "p")
    assert(out3("files_dropped") == 0L,
      "a null-introducing predicate must never take the stats-FULL tier")
    assert(keys(dir3) == ((0L until 100L) :+ 150L).toSet)

    // a literal NULL the optimizer sanitizes OUT of the positive filter
    // (`... OR NULL`) must not escalate into a whole-table drop: the
    // null-freedom proof judges the ANALYZED tree, where the literal
    // still exists
    val dir4 = newDir()
    Manifest.create(spark, dir4, lo, "p", statsCols = Seq("v"))
    Manifest.append(spark, dir4, hi, "p")
    Manifest.addConstraint(spark, dir4, "v_nn", "v IS NOT NULL")
    val out4 = Manifest.deleteWhere(spark, dir4, "v >= 100.0 OR NULL", "p")
    assert(out4("files_dropped") == 0L,
      "a NULL-capable predicate must never take the stats-FULL tier")
    assert(keys(dir4) == (0L until 100L).toSet,
      "only p IS TRUE rows delete; p IS NULL rows survive")
  }

  test("rows where the predicate is NULL are kept (SQL WHERE contract)") {
    val dir = newDir()
    val rows = Seq((1L, Some(5.0), 0L), (2L, None, 0L), (3L, Some(50.0), 0L))
      .toDF("k", "v", "p")
    Manifest.create(spark, dir, rows, "p", statsCols = Seq("v"))
    Manifest.deleteWhere(spark, dir, "v > 0.0", "p")
    assert(keys(dir) == Set(2L), "null-v row must survive a v > 0 delete")
  }

  test("null partition values never match comparisons, but p IS NULL takes them") {
    val dir = newDir()
    val rows = Seq((1L, Some(0L)), (2L, Some(1L)), (3L, Option.empty[Long]))
      .toDF("k", "p")
    Manifest.create(spark, dir, rows, "p")
    Manifest.deleteWhere(spark, dir, "p = 0", "p")
    assert(keys(dir) == Set(2L, 3L),
      "null-p row is not deleted by p = 0")
    // a NULL-MATCHING predicate on the partition column must delete the
    // null rows — the exact tier once classified has_null files as
    // provably clean under any predicate
    Manifest.deleteWhere(spark, dir, "p IS NULL", "p")
    assert(keys(dir) == Set(2L), "p IS NULL must delete the null-p rows")
  }

  test("DELETE WHERE false commits nothing; WHERE true truncates metadata-only") {
    val dir = newDir()
    perPartitionTable(dir, Seq(0L, 1L))
    val v0 = Manifest.versions(spark, dir).max
    val none = Manifest.deleteWhere(spark, dir, "1 = 2", "p")
    assert(none == Map("files_dropped" -> 0L, "files_rewritten" -> 0L))
    assert(Manifest.versions(spark, dir).max == v0,
      "a no-match delete must not commit")
    // all bytes gone: only a metadata-only truncate can succeed
    dropBytes(dir, Set(0L, 1L))
    val all = Manifest.deleteWhere(spark, dir, "true", "p")
    assert(all("files_dropped") > 0L && all("files_rewritten") == 0L)
    assert(Manifest.read(spark, dir).isEmpty)
    assert(Manifest.versions(spark, dir).max == v0 + 1)
    // the table stays writable after the truncate
    Manifest.append(spark, dir, Seq((9L, 9.0, 9L)).toDF("k", "v", "p"), "p")
    assert(keys(dir) == Set(9L))
  }

  test("deleteWhereMor: full files drop metadata-only, straddlers get one DV") {
    val dir = newDir()
    perPartitionTable(dir, Seq(0L, 1L, 2L))
    // exact-tier MoR drop with the bytes already gone: metadata-only
    dropBytes(dir, Set(0L))
    val drop = Manifest.deleteWhereMor(spark, dir, "p = 0", "p")
    assert(drop("files_dropped") > 0L && drop("files_masked") == 0L)
    val before = files(dir)
    // stats-tier MoR mask: p=1's file (v in [100,200)) straddles, p=2's
    // (v in [200,300)) provably cannot match — untouched
    val mask = Manifest.deleteWhereMor(spark, dir,
      "v >= 150.0 AND v < 200.0", "p")
    assert(mask("files_dropped") == 0L && mask("files_masked") > 0L)
    assert(files(dir) == before, "MoR must not add or remove data files")
    assert(keys(dir) == ((100L until 150L) ++ (200L until 300L)).toSet)
    // CoW rewrite of the DV'd straddler: masked rows must not resurrect
    Manifest.deleteWhere(spark, dir, "v >= 120.0 AND v < 130.0", "p")
    assert(keys(dir) ==
      ((100L until 120L) ++ (130L until 150L) ++ (200L until 300L)).toSet)
  }

  test("change feed: a metadata-only drop still yields exact delete rows") {
    val dir = newDir()
    perPartitionTable(dir, Seq(0L, 1L))
    val v0 = Manifest.versions(spark, dir).max
    Manifest.deleteWhere(spark, dir, "p = 0", "p")
    val ch = Manifest.changes(spark, dir, v0, v0 + 1)
    val deletes = ch.filter(col("change") === "delete")
      .select("k").as[Long].collect().toSet
    assert(deletes == (0L until 100L).toSet)
    assert(ch.filter(col("change") === "insert").isEmpty,
      "a pure metadata drop adds no rows")
  }

  test("predicate speaks logical names on a renamed table") {
    val dir = newDir()
    perPartitionTable(dir, Seq(0L, 1L))
    Manifest.renameColumn(spark, dir, "v", "score")
    Manifest.deleteWhere(spark, dir, "score < 50.0 AND p = 0", "p")
    assert(keys(dir) == ((50L until 100L) ++ (100L until 200L)).toSet)
    val cols = Manifest.read(spark, dir).columns.toSet
    assert(cols == Set("k", "score", "p"))
  }

  test("deleteWhere refuses unknown columns loudly") {
    val dir = newDir()
    perPartitionTable(dir, Seq(0L))
    intercept[Exception] {
      Manifest.deleteWhere(spark, dir, "nope < 1", "p")
    }
  }
}
