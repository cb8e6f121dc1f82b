package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Column mapping: RENAME/DROP COLUMN as metadata-only commits — the
  * physical files never rewrite; a sentinel-carried map translates at
  * the public API boundary; pruning, DVs, constraints, the change feed,
  * time travel, and the batch DataSource all keep working on the
  * logical names. */
class ManifestColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() = s"${Files.createTempDirectory("graft-cmap")}/tbl"

  private def base = spark.range(1, 61)
    .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" % 3).as("p"))

  private def kv(df: DataFrame, valueCol: String): Map[Long, Double] =
    df.select(col("k"), col(valueCol)).as[(Long, Double)].collect().toMap

  test("rename is METADATA-ONLY: same physical files, new logical face, old face time-travels") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p", statsCols = Seq("k"))
    Manifest.append(spark, dir, Seq((100L, 9.0, 1L)).toDF("k", "v", "p"), "p")
    val filesBefore = Manifest.read(spark, dir).inputFiles.toSet
    Manifest.renameColumn(spark, dir, "v", "amount")
    val out = Manifest.read(spark, dir)
    assert(out.columns.toSeq == Seq("k", "amount", "p"))
    assert(out.inputFiles.toSet == filesBefore,
      "a rename must not touch one data file")
    assert(kv(out, "amount") == kv(
      Manifest.readVersion(spark, dir, 2L), "v"),
      "same rows under the new name")
    // the map is part of the snapshot: older versions keep THEIR names
    assert(Manifest.readVersion(spark, dir, 1L).columns.toSeq ==
      Seq("k", "v", "p"))
    assert(Manifest.columnMapping(spark, dir) ==
      Seq(("k", "k"), ("amount", "v"), ("p", "p")))
    // restore to the pre-rename version restores the pre-rename name
    Manifest.restore(spark, dir, 2L)
    assert(Manifest.read(spark, dir).columns.toSeq == Seq("k", "v", "p"))
  }

  test("every write path speaks the logical name after a rename") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.renameColumn(spark, dir, "v", "amount")
    Manifest.renameColumn(spark, dir, "p", "part")
    def logical(rows: Seq[(Long, Double, Long)]) =
      rows.toDF("k", "amount", "part")
    Manifest.append(spark, dir, logical(Seq((100L, 9.0, 0L))), "part")
    Manifest.upsert(spark, dir, logical(Seq((5L, 555.0, 2L))),
      Seq("k"), "part")
    Manifest.delete(spark, dir, Seq((7L, 1L)).toDF("k", "part"),
      Seq("k"), "part")
    Manifest.deleteMor(spark, dir, Seq((8L, 2L)).toDF("k", "part"),
      Seq("k"), "part")
    Manifest.upsertMor(spark, dir, logical(Seq((9L, 999.0, 0L))),
      Seq("k"), "part")
    Manifest.overwritePartitions(spark, dir, logical(Seq((900L, 1.0, 1L))),
      "part")
    val expect = (1L to 60L).map(i => i -> i * 1.0).toMap ++
      Map(100L -> 9.0, 5L -> 555.0, 9L -> 999.0, 900L -> 1.0) --
      Seq(7L, 8L) -- (1L to 60L).filter(_ % 3 == 1) // partition 1 replaced
    assert(kv(Manifest.read(spark, dir), "amount") == expect)
    // maintenance keeps working on the logical names too
    Manifest.compact(spark, dir, "part", smallBytes = Long.MaxValue / 2)
    Manifest.materialize(spark, dir, "part")
    assert(kv(Manifest.read(spark, dir), "amount") == expect)
    // an unknown (old) name refuses loudly everywhere
    val e = intercept[IllegalArgumentException] {
      Manifest.append(spark, dir,
        Seq((1L, 1.0, 0L)).toDF("k", "v", "part"), "part")
    }
    assert(e.getMessage.contains("do not exist"))
  }

  test("stats/partition pruning and point reads keep firing through the map") {
    val dir = newDir()
    val wide = spark.range(1, 4001)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" % 3).as("p"))
    Manifest.create(spark, dir, wide, "p",
      statsCols = Seq("k"), bloomCols = Seq("k"))
    // lay several k-disjoint files, THEN rename the stats column — the
    // recorded physical stats must keep pruning through the map
    Manifest.cluster(spark, dir, "p", "k", targetBytes = 8192)
    Manifest.renameColumn(spark, dir, "k", "id")
    val all = Manifest.read(spark, dir).inputFiles.length
    val ranged = Manifest.readRange(spark, dir, "id", Some("1"), Some("5"))
    assert(ranged.select("id").as[Long].collect().sorted.toSeq ==
      (1L to 5L))
    assert(ranged.inputFiles.length < all,
      s"range read must open fewer than all $all files")
    val point = Manifest.readPoint(spark, dir, "id", "17")
    assert(point.select("id").as[Long].collect().toSeq == Seq(17L))
    assert(point.inputFiles.length < all)
    // planner venue: a WHERE over the logical name pushes through the
    // aliasing projection into the pruned physical scan
    val scanned = graft.plans.ManifestScan
      .scan(spark, dir, partitionCol = Some("p"))
      .where($"id" === 17L && $"p" === 2L)
    assert(scanned.select("id").as[Long].collect().toSeq == Seq(17L))
    // COLUMN PRUNING crosses the projection too: a two-column read of a
    // mapped table must reach the parquet scan with a two-column
    // ReadSchema (physical names), not the full row
    val narrow = graft.plans.ManifestScan.scan(spark, dir)
      .where($"id" > 3998L).select("id")
    val fileScan = narrow.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val readCols = fileScan.requiredSchema.fieldNames.toSet
    assert(readCols == Set("k"),
      s"the physical scan must read ONLY the pruned column, got $readCols")
    assert(narrow.as[Long].collect().sorted.toSeq == Seq(3999L, 4000L))
  }

  test("drop hides the column; re-adding the name binds a FRESH physical slot") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.dropColumn(spark, dir, "v")
    val out = Manifest.read(spark, dir)
    assert(out.columns.toSeq == Seq("k", "p"))
    // writes now carry only the visible columns; the dropped physical
    // slot null-fills so the physical schema stays constant
    Manifest.append(spark, dir, Seq((100L, 0L)).toDF("k", "p"), "p")
    assert(Manifest.read(spark, dir).count() == 61)
    // time travel before the drop still shows v
    assert(Manifest.readVersion(spark, dir, 1L).columns.toSeq ==
      Seq("k", "v", "p"))
    // re-add the logical name: a fresh slot — old values must NOT leak
    Manifest.evolve(spark, dir, Seq("v" -> "double"))
    val re = Manifest.read(spark, dir)
    assert(re.columns.toSeq == Seq("k", "p", "v"))
    assert(re.where($"v".isNotNull).count() == 0,
      "the re-added column is a fresh slot, not the dropped data")
    Manifest.append(spark, dir, Seq((200L, 1L, 7.5)).toDF("k", "p", "v"), "p")
    assert(Manifest.read(spark, dir).where($"v".isNotNull)
      .select("k").as[Long].collect().toSeq == Seq(200L))
  }

  test("constraints translate to physical at add; drop of a constrained column refuses") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.renameColumn(spark, dir, "v", "amount")
    Manifest.addConstraint(spark, dir, "amount_pos", "amount > 0")
    // enforcement works on writes through the logical face
    intercept[Manifest.ConstraintViolationException] {
      Manifest.append(spark, dir,
        Seq((500L, -1.0, 0L)).toDF("k", "amount", "p"), "p")
    }
    val e = intercept[IllegalArgumentException] {
      Manifest.dropColumn(spark, dir, "amount")
    }
    assert(e.getMessage.contains("constraint"))
    // the guard matches PARSED attribute references, not substrings:
    // "p" occurs inside "amount_pos"/"amount > 0" as letters, but the
    // constraint does not reference column p — its drop must pass
    Manifest.dropColumn(spark, dir, "k")
    Manifest.dropConstraint(spark, dir, "amount_pos")
    Manifest.dropColumn(spark, dir, "amount")
    assert(Manifest.read(spark, dir).columns.toSeq == Seq("p"))
  }

  test("undrop recovers a dropped PARTITION column (the unwritable-table escape hatch)") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.dropColumn(spark, dir, "p")
    // the partition column is gone: every write path refuses loudly
    val e = intercept[IllegalArgumentException] {
      Manifest.append(spark, dir, Seq((100L, 9.0)).toDF("k", "v"), "p")
    }
    assert(e.getMessage.contains("does not exist"))
    // undrop re-binds the physical slot — also metadata-only — and the
    // table is writable again; the hidden values were never lost
    Manifest.undropColumn(spark, dir, "p", "p")
    Manifest.append(spark, dir, Seq((100L, 9.0, 1L)).toDF("k", "v", "p"), "p")
    assert(Manifest.read(spark, dir).where($"p".isNull).count() == 0,
      "pre-drop partition values reappear intact after the undrop")
    assert(Manifest.read(spark, dir).count() == 61)
    // refusals: unknown slot, already-visible slot, taken logical name
    intercept[IllegalArgumentException] {
      Manifest.undropColumn(spark, dir, "zz", "zz")
    }
    intercept[IllegalArgumentException] {
      Manifest.undropColumn(spark, dir, "v", "v2")
    }
    Manifest.dropColumn(spark, dir, "v")
    intercept[IllegalArgumentException] {
      Manifest.undropColumn(spark, dir, "v", "k")
    }
  }

  test("change feed and streaming-source schema speak the logical names") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.renameColumn(spark, dir, "v", "amount")
    Manifest.append(spark, dir, Seq((100L, 9.0, 1L)).toDF("k", "amount", "p"),
      "p")
    val feed = Manifest.changes(spark, dir, 2L, 3L)
    assert(feed.columns.toSeq == Seq("k", "amount", "p", "change"))
    assert(feed.select("k", "change").as[(Long, String)].collect().toSeq ==
      Seq((100L, "insert")))
    val signed = Manifest.changesSigned(spark, dir, 2L, 3L)
    assert(signed.columns.toSeq == Seq("k", "amount", "p", "sign"))
    assert(Manifest.appendedBetween(spark, dir, 2L, 3L).get
      .columns.toSeq == Seq("k", "amount", "p"))
    assert(Manifest.tableSchema(spark, dir).fieldNames.toSeq ==
      Seq("k", "amount", "p"))
  }

  test("DV-masked reads and the batch DataSource work on a mapped table") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.renameColumn(spark, dir, "v", "amount")
    Manifest.deleteMor(spark, dir, Seq((5L, 2L)).toDF("k", "p"),
      Seq("k"), "p")
    val ds = spark.read.format("graft-manifest").load(dir)
    assert(ds.columns.toSeq == Seq("k", "amount", "p"))
    assert(ds.where($"k" === 5L).count() == 0,
      "the DV mask applies under the logical face")
    assert(ds.where($"amount" > 58.0).select("k").as[Long]
      .collect().sorted.toSeq == Seq(59L, 60L))
    // writer through the DataSource speaks logical names too
    Seq((100L, 9.0, 0L)).toDF("k", "amount", "p")
      .write.format("graft-manifest").mode("append")
      .option("partitionCol", "p").save(dir)
    assert(spark.read.format("graft-manifest").load(dir).count() == 60)
    // a mapped table WITHOUT DVs also routes through the logical-face
    // relation: same answers
    val dir2 = newDir()
    Manifest.create(spark, dir2, base, "p")
    Manifest.renameColumn(spark, dir2, "k", "id")
    val ds2 = spark.read.format("graft-manifest").load(dir2)
    assert(ds2.columns.toSeq == Seq("id", "v", "p"))
    assert(ds2.where($"id" <= 3L).count() == 3)
  }

  test("rename/drop refusals: taken name, unknown column, last column") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    intercept[IllegalArgumentException] {
      Manifest.renameColumn(spark, dir, "v", "k")
    }
    intercept[IllegalArgumentException] {
      Manifest.renameColumn(spark, dir, "zz", "w")
    }
    intercept[IllegalArgumentException] {
      Manifest.renameColumn(spark, dir, "v", "bad name")
    }
    intercept[IllegalArgumentException] {
      Manifest.dropColumn(spark, dir, "zz")
    }
    Manifest.dropColumn(spark, dir, "v")
    Manifest.dropColumn(spark, dir, "p")
    intercept[IllegalArgumentException] {
      Manifest.dropColumn(spark, dir, "k")
    }
  }

  test("rename/drop/undrop ride the chain as O(1) colmap links, re-root absorbs") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.append(spark, dir, Seq((100L, 9.0, 1L)).toDF("k", "v", "p"), "p")
    def depth() = Manifest.detail(spark, dir)
      .select("chain_depth").as[Long].head()
    val d0 = depth()
    Manifest.renameColumn(spark, dir, "v", "amount")
    // a LINK, not a re-root: the chain grew by one (a re-root resets
    // depth to 1) — nothing entry-sized staged
    assert(depth() == d0 + 1,
      "rename must ride the chain as an O(1) colmap link")
    assert(Manifest.read(spark, dir).columns.toSeq ==
      Seq("k", "amount", "p"))
    // time travel inside the same chain keeps the pre-rename face
    assert(Manifest.readVersion(spark, dir, 2L).columns.toSeq ==
      Seq("k", "v", "p"))
    // later linked commits re-emit the map cumulatively
    Manifest.append(spark, dir,
      Seq((200L, 8.0, 2L)).toDF("k", "amount", "p"), "p")
    assert(Manifest.columnMapping(spark, dir) ==
      Seq(("k", "k"), ("amount", "v"), ("p", "p")))
    // drop + undrop link too
    Manifest.dropColumn(spark, dir, "amount")
    assert(Manifest.read(spark, dir).columns.toSeq == Seq("k", "p"))
    Manifest.undropColumn(spark, dir, "v", "amount2")
    assert(Manifest.columnMapping(spark, dir) ==
      Seq(("k", "k"), ("p", "p"), ("amount2", "v")))
    // a re-root (evolve rewrites the sentinel DDL) absorbs the chain
    // map into the fresh sentinel
    Manifest.evolve(spark, dir, Seq("extra" -> "double"))
    assert(depth() == 1L, "evolve must re-root the chain")
    assert(Manifest.columnMapping(spark, dir) ==
      Seq(("k", "k"), ("p", "p"), ("amount2", "v"), ("extra", "extra")))
    val vals = Manifest.read(spark, dir).select("k", "amount2")
      .as[(Long, Double)].collect().toMap
    assert(vals(100L) == 9.0 && vals(200L) == 8.0 && vals(5L) == 5.0)
  }

  test("widenColumn is metadata-only, speaks the logical name, refuses narrowing") {
    val dir = newDir()
    Manifest.create(spark, dir,
      spark.range(1, 61).select($"id".as("k"),
        ($"id" * 10).cast("int").as("n"), ($"id" % 3).as("p")),
      "p", statsCols = Seq("n"))
    val filesBefore = Manifest.read(spark, dir).inputFiles.toSet
    // widen through a RENAMED face: logical name resolves to the
    // physical slot like every public API
    Manifest.renameColumn(spark, dir, "n", "amount")
    Manifest.widenColumn(spark, dir, "amount", "bigint")
    val out = Manifest.read(spark, dir)
    assert(out.schema("amount").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(out.inputFiles.toSet == filesBefore,
      "a widen must not touch one data file")
    assert(out.select(sum($"amount")).as[Long].head() == (1L to 60L).map(_ * 10).sum)
    // stats pruning still fires on the widened column (int stat strings
    // order identically as longs)
    assert(Manifest.read(spark, dir).where($"amount" > 999999L).count() == 0)
    // post-widen writes carry longs; values beyond int range round-trip
    Manifest.append(spark, dir,
      Seq((100L, 5000000000L, 0L)).toDF("k", "amount", "p"), "p")
    assert(Manifest.read(spark, dir).where($"amount" === 5000000000L)
      .count() == 1)
    // time travel reads the OLD type under the old sentinel
    assert(Manifest.readVersion(spark, dir, 1L).schema("n").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // refusals: narrowing, re-typing, unknown column
    intercept[IllegalArgumentException] {
      Manifest.widenColumn(spark, dir, "amount", "int")
    }
    intercept[IllegalArgumentException] {
      Manifest.widenColumn(spark, dir, "amount", "string")
    }
    intercept[IllegalArgumentException] {
      Manifest.widenColumn(spark, dir, "ghost", "bigint")
    }
  }

  test("widenColumn: hash-unstable bloom column is dropped; rendering-unstable widens refuse") {
    val dir = newDir()
    // n is BOTH the merge key and a bloom column; int→long changes its
    // xxhash64, so keeping the bloom would let old files' bits MISS the
    // long-typed probe and a keyed write would skip its candidate — the
    // widen must drop the bloom and the upsert below must still find
    // and rewrite the old row (lost-update check)
    Manifest.create(spark, dir,
      spark.range(1, 41).select($"id".as("k"),
        ($"id" * 10).cast("int").as("n"),
        ($"id" % 2).as("p"), ($"id".cast("float")).as("fv"),
        ($"id".cast("decimal(10,2)")).as("dm")),
      "p", bloomCols = Seq("n"))
    assert(Manifest.loadSnapshot(spark, dir).bloomCols == Seq("n"))
    Manifest.widenColumn(spark, dir, "n", "bigint")
    assert(Manifest.loadSnapshot(spark, dir).bloomCols.isEmpty,
      "int→long changes xxhash64 — the bloom must be dropped")
    Manifest.upsert(spark, dir,
      Seq((999L, 100L, 0L, 10.0f, BigDecimal(10)))
        .toDF("k", "n", "p", "fv", "dm")
        .select($"k", $"n", $"p", $"fv",
          $"dm".cast("decimal(10,2)").as("dm")),
      Seq("n"), "p")
    val hit = Manifest.read(spark, dir).where($"n" === 100L)
      .select("k").as[Long].collect().toSeq
    assert(hit == Seq(999L),
      s"keyed write after the widen must rewrite the old row, got $hit")
    // rendering-unstable widens refuse toward a rewrite: float→double
    // exposes values above the recorded float-rendered stats max, and
    // a decimal scale growth re-renders stored partition values
    intercept[IllegalArgumentException] {
      Manifest.widenColumn(spark, dir, "fv", "double")
    }
    intercept[IllegalArgumentException] {
      Manifest.widenColumn(spark, dir, "dm", "decimal(12,4)")
    }
    // same-scale decimal precision growth IS rendering- and hash-stable
    Manifest.widenColumn(spark, dir, "dm", "decimal(14,2)")
    assert(Manifest.read(spark, dir).schema("dm").dataType ==
      org.apache.spark.sql.types.DecimalType(14, 2))
    // the CDC fold gate matches widenColumn's rule: an upstream
    // float→double widen (lossless cast, NOT rendering-stable) refuses
    // at the replication level with the rewrite remedy instead of
    // wedging on widenColumn's require (code-review finding)
    val batch = Seq((999L, 123L, 0L, 1.5d,
        BigDecimal(1), "insert"))
      .toDF("k", "n", "p", "fv", "dm", "change")
      .select($"k", $"n", $"p", $"fv",
        $"dm".cast("decimal(14,2)").as("dm"), $"change")
    val e = intercept[IllegalArgumentException] {
      Manifest.applyChangesIfAbsent(spark, dir, batch, Seq("n"), "p",
        "cmap-widen-app", 1L, evolveSchema = true)
    }
    assert(e.getMessage.contains("not foldable"),
      s"expected the replication-level refusal, got: ${e.getMessage}")
  }

  test("applyChanges works on a dropped-column table (CDC replication after DROP COLUMN)") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p", statsCols = Seq("k"))
    Manifest.dropColumn(spark, dir, "v")
    // the CDC batch speaks the VISIBLE face (k, p): delete k=1, update
    // k=2 (delete+insert pair), insert k=100 — the hidden dropped slot
    // must null-fill on the re-inserted rows, not fail unresolved
    val batch = Seq(
      (1L, 1L, "delete", 1L),
      (2L, 2L, "delete", 1L), (2L, 2L, "insert", 2L),
      (100L, 0L, "insert", 1L)
    ).toDF("k", "p", "change", "ord")
    Manifest.applyChanges(spark, dir, batch, Seq("k"), "p",
      orderCol = Some("ord"))
    val out = Manifest.read(spark, dir)
    assert(out.columns.toSeq == Seq("k", "p"))
    val ks = out.select("k").as[Long].collect().toSet
    assert(!ks.contains(1L) && ks.contains(2L) && ks.contains(100L))
    assert(out.count() == 60)
    // pre-drop versions still time-travel with v intact
    assert(Manifest.readVersion(spark, dir, 1L).columns.toSeq ==
      Seq("k", "v", "p"))
    // a batch missing a VISIBLE column still refuses loudly
    val dir2 = newDir()
    Manifest.create(spark, dir2, base, "p")
    val e = intercept[IllegalArgumentException] {
      Manifest.applyChanges(spark, dir2,
        Seq((1L, 1L, "insert")).toDF("k", "p", "change"), Seq("k"), "p")
    }
    assert(e.getMessage.contains("missing column"))
  }
}
