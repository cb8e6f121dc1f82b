package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def state(dir: String): Map[Long, (Double, Long)] =
    spark.read.parquet(dir)
      .select($"k", $"v", $"p".cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

  private def partFiles(dir: String, p: Long): Map[String, (Long, Long)] = {
    val d = new java.io.File(s"$dir/p=$p")
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  test("mergeInto: bootstrap, upsert, partition pruning, idempotence") {
    val dir = Files.createTempDirectory("graft-merge").toString + "/tbl"

    // bootstrap: keys 1..100, partition k/50 (0: 1-49, 1: 50-99, 2: 100)
    val base = spark.range(1, 101)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" / 50).cast("long").as("p"))
    Merge.mergeInto(spark, dir, base, Seq("k"), "p")
    assert(state(dir) == (1L to 100L).map(k => k -> (k * 1.0, k / 50)).toMap)

    val before = partFiles(dir, 1) // partition 1 must survive untouched

    // updates touch partitions 0 (existing keys 10..20) and 2 (new keys
    // 130..140); partition 1 is not in the batch
    val updates = (spark.range(10, 21) union spark.range(130, 141))
      .select($"id".as("k"), ($"id" * 10.0).as("v"),
        when($"id" >= 100, 2L).otherwise(0L).as("p"))
    Merge.mergeInto(spark, dir, updates, Seq("k"), "p")

    val expect =
      (1L to 100L).map(k => k -> (k * 1.0, k / 50)).toMap ++
        (10L to 20L).map(k => k -> (k * 10.0, 0L)).toMap ++
        (130L to 140L).map(k => k -> (k * 10.0, 2L)).toMap
    assert(state(dir) == expect)

    // copy-on-write is partition-pruned: the untouched partition's files
    // are the SAME files, not rewritten copies
    assert(partFiles(dir, 1) == before,
      "partition 1 was rewritten despite not being in the update batch")

    // rerun of the same batch is a no-op on the answer (reference rerun
    // semantics: put_item of the same key+values)
    Merge.mergeInto(spark, dir, updates, Seq("k"), "p")
    assert(state(dir) == expect)
  }

  test("prunedTarget at 5k touched partitions: directory selection, no giant In literal") {
    // Above InListThreshold the target read must stop building an
    // In-literal (a 5k-element In is a driver planning blowup: every
    // Catalyst transform walks and copies the literal list) and instead
    // hand the reader the affected directories — pruning by construction.
    val dir = Files.createTempDirectory("graft-merge-5k").toString + "/tbl"
    val base = spark.range(0, 16)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), $"id".as("p"))
    Merge.mergeInto(spark, dir, base, Seq("k"), "p")

    // a batch touching 5,000 distinct partitions (16 existing + 4,984 new)
    val updates = spark.range(0, 5000)
      .select($"id".as("k"), ($"id" * 10.0).as("v"), $"id".as("p"))
    val pruned = Merge.prunedTarget(spark, dir, updates, "p",
      Merge.InListThreshold)
    val plan = pruned.queryExecution.optimizedPlan.toString
    assert(!plan.contains(" IN ") && !plan.toLowerCase.contains("isin"),
      s"directory-selection path must not plan an In literal:\n$plan")
    // reads exactly the existing touched partitions' files, nothing more
    assert(pruned.inputFiles.length == 16, s"got ${pruned.inputFiles.length}")
    assert(pruned.select($"k", $"p".cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      (0L until 16L).map(k => (k, k)).toSet)
  }

  test("mergeInto end-to-end through the directory-selection branch") {
    // Same semantics as the In-literal path, exercised past the threshold
    // (forced low so the test stays fast): updates rewrite their
    // partitions, untouched partitions keep their exact files.
    val dir = Files.createTempDirectory("graft-merge-dirsel").toString + "/tbl"
    val base = spark.range(0, 60)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" % 20).as("p"))
    Merge.mergeInto(spark, dir, base, Seq("k"), "p")
    val before = partFiles(dir, 19) // p=19 is not in the update batch

    val updates = spark.range(0, 18)
      .select($"id".as("k"), ($"id" * 10.0).as("v"), ($"id" % 20).as("p"))
    Merge.mergeInto(spark, dir, updates, Seq("k"), "p", inListThreshold = 5)

    val expect =
      (0L until 60L).map(k => k -> (k * 1.0, k % 20)).toMap ++
        (0L until 18L).map(k => k -> (k * 10.0, k % 20)).toMap
    assert(state(dir) == expect)
    assert(partFiles(dir, 19) == before,
      "untouched partition rewritten by the directory-selection branch")
  }

  test("mergeInto directory selection unescapes Hive-escaped partition values; null partitions insert") {
    // Partition values the dynamic writer must Hive-escape in directory
    // names (: and % and =) round-trip through the directory-selection
    // branch; a null-partitioned update row into a table with no null
    // partition yet is a plain insert.
    val dir = Files.createTempDirectory("graft-merge-esc").toString + "/tbl"
    def st(): Map[Long, (Double, String)] = spark.read.parquet(dir)
      .select($"k", $"v", $"p".cast("string"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap

    val base = Seq(
      (1L, 1.0, "a:b"), (2L, 2.0, "c%d"), (3L, 3.0, "e=f"), (4L, 4.0, "plain"))
      .toDF("k", "v", "p")
    Merge.mergeInto(spark, dir, base, Seq("k"), "p")
    // escaped directory names on disk, readable values in the frame
    val dirNames = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirNames.contains("p=a%3Ab"), s"expected Hive escaping, got $dirNames")

    val upd = Seq(
      (1L, 10.0, Some("a:b")), (2L, 20.0, Some("c%d")),
      (5L, 50.0, Option.empty[String]))
      .toDF("k", "v", "p")
    Merge.mergeInto(spark, dir, upd, Seq("k"), "p", inListThreshold = 0)
    assert(st() == Map(
      1L -> (10.0, "a:b"), 2L -> (20.0, "c%d"), 3L -> (3.0, "e=f"),
      4L -> (4.0, "plain"), 5L -> (50.0, null)))
  }

  test("mergeInto: a pre-existing null partition survives and merges on both branches") {
    // the dynamic overwrite rewrites __HIVE_DEFAULT_PARTITION__ whenever
    // the update batch touches it — so its EXISTING rows must join the
    // merge or they'd be deleted with the rewrite
    for (threshold <- Seq(1000, 0)) { // In-literal branch, directory branch
      val dir = Files.createTempDirectory("graft-merge-nullpart").toString + "/tbl"
      def st(): Map[Long, (Double, String)] = spark.read.parquet(dir)
        .select($"k", $"v", $"p".cast("string"))
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
      val base = Seq(
        (1L, 1.0, Option.empty[String]), (2L, 2.0, Some("kept")))
        .toDF("k", "v", "p")
      Merge.mergeInto(spark, dir, base, Seq("k"), "p")
      // update: new key into the null partition + revision of an
      // existing null-partition key; the untouched "kept" partition and
      // the untouched null-partition... there is none — key 1 must merge
      val upd = Seq(
        (1L, 10.0, Option.empty[String]), (3L, 30.0, Option.empty[String]))
        .toDF("k", "v", "p")
      Merge.mergeInto(spark, dir, upd, Seq("k"), "p", inListThreshold = threshold)
      assert(st() == Map(
        1L -> (10.0, null), 2L -> (2.0, "kept"), 3L -> (30.0, null)),
        s"threshold=$threshold")
      // idempotent rerun
      Merge.mergeInto(spark, dir, upd, Seq("k"), "p", inListThreshold = threshold)
      assert(st() == Map(
        1L -> (10.0, null), 2L -> (2.0, "kept"), 3L -> (30.0, null)))
    }
  }

  test("mergeInto: null update columns keep the target's value") {
    val dir = Files.createTempDirectory("graft-merge-null").toString + "/tbl"
    val base = Seq((1L, 5.0, 0L), (2L, 6.0, 0L)).toDF("k", "v", "p")
    Merge.mergeInto(spark, dir, base, Seq("k"), "p")
    val upd = Seq((1L, Option.empty[Double], 0L), (2L, Some(60.0), 0L))
      .toDF("k", "v", "p")
    Merge.mergeInto(spark, dir, upd, Seq("k"), "p")
    assert(state(dir) == Map(1L -> (5.0, 0L), 2L -> (60.0, 0L)))
  }

  test("deleteWhere: keyed delete, untouched partitions intact, emptied partition removed, idempotent") {
    val dir = Files.createTempDirectory("graft-delete").toString + "/tbl"
    // partitions: 0 -> keys 1..49, 1 -> keys 50..99, 2 -> key 100
    val base = spark.range(1, 101)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" / 50).cast("long").as("p"))
    base.write.partitionBy("p").parquet(dir)
    val before = partFiles(dir, 1)

    // delete some of partition 0 and ALL of partition 2; partition 1 untouched
    val dels = (spark.range(10, 21) union spark.range(100, 101))
      .select($"id".as("k"), when($"id" >= 100, 2L).otherwise(0L).as("p"))
    Merge.deleteWhere(spark, dir, dels, Seq("k"), "p")

    assert(state(dir) == (1L to 99L).filterNot(k => k >= 10 && k <= 20)
      .map(k => k -> (k * 1.0, k / 50)).toMap)
    // the fully-emptied partition's directory is gone (dynamic overwrite
    // alone can't express it)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/p=2")))
    // untouched partition byte-identical
    assert(partFiles(dir, 1) == before)
    // idempotent rerun
    Merge.deleteWhere(spark, dir, dels, Seq("k"), "p")
    assert(state(dir) == (1L to 99L).filterNot(k => k >= 10 && k <= 20)
      .map(k => k -> (k * 1.0, k / 50)).toMap)
  }

  test("deleteWhere: a batch that empties every touched partition still completes") {
    val dir = Files.createTempDirectory("graft-delete-all").toString + "/tbl"
    val base = Seq((1L, 1.0, 0L), (2L, 2.0, 0L), (3L, 3.0, 1L))
      .toDF("k", "v", "p")
    base.write.partitionBy("p").parquet(dir)
    // wipe ALL of partition 0 — zero survivors among touched partitions,
    // so there is nothing to stage (the empty-staging read-back case)
    val dels = Seq((1L, 0L), (2L, 0L)).toDF("k", "p")
    Merge.deleteWhere(spark, dir, dels, Seq("k"), "p")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/p=0")))
    assert(state(dir) == Map(3L -> (3.0, 1L)))
  }

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def hist(rows: Seq[(Long, Option[String], String, Option[String])]) =
    rows.toDF("k", "attr", "valid_from", "valid_to")
      .select($"k", $"attr", $"valid_from".cast("date").as("valid_from"),
        $"valid_to".cast("date").as("valid_to"))

  test("scd2Apply: change closes + reopens; no-op, stale, new key, closed pass-through") {
    val history = hist(Seq(
      // key 1: one closed version + a current one (closed must pass through)
      (1L, Some("a"), "2024-01-01", Some("2024-02-01")),
      (1L, Some("b"), "2024-02-01", None),
      (2L, Some("x"), "2024-01-01", None), // will no-op
      (3L, Some("y"), "2024-01-01", None), // will get a stale update
      (4L, None,      "2024-01-01", None)  // null attr -> real change
    ))
    val updates = Seq(
      (1L, Some("c"), "2024-03-01"), // change
      (2L, Some("x"), "2024-03-01"), // identical -> no-op
      (3L, Some("z"), "2024-01-01"), // effective == valid_from -> stale, dropped
      (4L, Some("w"), "2024-03-01"), // null -> value is a change
      (9L, None,      "2024-03-01")  // brand-new key, null attr
    ).toDF("k", "attr", "eff").select($"k", $"attr", $"eff".cast("date").as("eff"))

    val out = Merge.scd2Apply(history, updates, Seq("k"), Seq("attr"), "eff")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDate(2), Option(r.getDate(3)))).toSet

    assert(out == Set(
      (1L, Some("a"), d("2024-01-01"), Some(d("2024-02-01"))),
      (1L, Some("b"), d("2024-02-01"), Some(d("2024-03-01"))),
      (1L, Some("c"), d("2024-03-01"), None),
      (2L, Some("x"), d("2024-01-01"), None),
      (3L, Some("y"), d("2024-01-01"), None),
      (4L, None,      d("2024-01-01"), Some(d("2024-03-01"))),
      (4L, Some("w"), d("2024-03-01"), None),
      (9L, None,      d("2024-03-01"), None)))
  }

  test("scd2Apply: an all-closed (retired) key re-activates on update, history intact") {
    val history = hist(Seq(
      (5L, Some("old"), "2024-01-01", Some("2024-02-01")))) // retired: no current row
    val upd = Seq((5L, Some("back"), "2024-03-01")).toDF("k", "attr", "eff")
      .select($"k", $"attr", $"eff".cast("date").as("eff"))
    val out = Merge.scd2Apply(history, upd, Seq("k"), Seq("attr"), "eff")
      .collect().map(r => (r.getString(1), r.getDate(2), Option(r.getDate(3)))).toSet
    assert(out == Set(
      ("old", d("2024-01-01"), Some(d("2024-02-01"))),
      ("back", d("2024-03-01"), None)))
  }

  test("scd2Apply: out-of-order replay for a retired key is dropped, not opened inside closed history") {
    val history = hist(Seq(
      (5L, Some("v1"), "2024-01-01", Some("2024-02-01")),
      (5L, Some("v2"), "2024-02-01", Some("2024-04-01")))) // retired at 04-01
    // an update effective INSIDE the closed range (an out-of-order CDC
    // replay) must not open a current row overlapping v2's validity
    def upd(eff: String) = Seq((5L, Some("ghost"), eff)).toDF("k", "attr", "eff")
      .select($"k", $"attr", $"eff".cast("date").as("eff"))
    for (eff <- Seq("2024-01-15", "2024-03-01", "2024-04-01")) {
      val out = Merge.scd2Apply(history, upd(eff), Seq("k"), Seq("attr"), "eff")
        .collect().map(r => (r.getString(1), r.getDate(2), Option(r.getDate(3)))).toSet
      assert(out == Set(
        ("v1", d("2024-01-01"), Some(d("2024-02-01"))),
        ("v2", d("2024-02-01"), Some(d("2024-04-01")))),
        s"eff=$eff must be dropped as a stale re-activation")
      // invariant: no two rows of the key's history may overlap at any date
      val rows = out.toSeq.map { case (_, f, t) => (f.toString, t.map(_.toString)) }
      for ((f1, t1) <- rows; (f2, t2) <- rows if (f1, t1) != (f2, t2))
        assert(t1.exists(_ <= f2) || t2.exists(_ <= f1),
          s"overlapping validity: [$f1,$t1) vs [$f2,$t2)")
    }
    // a later effective date still re-activates
    val ok = Merge.scd2Apply(history, upd("2024-05-01"), Seq("k"), Seq("attr"), "eff")
      .collect().map(r => (r.getString(1), r.getDate(2), Option(r.getDate(3)))).toSet
    assert(ok.contains(("ghost", d("2024-05-01"), None)) && ok.size == 3)
  }

  test("scd2Apply: folding batches oldest-first chains versions; refold of batch 1 is a no-op") {
    val h0 = hist(Seq((7L, Some("v1"), "2024-01-01", None)))
    def upd(v: String, eff: String) =
      Seq((7L, Option(v), eff)).toDF("k", "attr", "eff")
        .select($"k", $"attr", $"eff".cast("date").as("eff"))
    val h1 = Merge.scd2Apply(h0, upd("v2", "2024-02-01"), Seq("k"), Seq("attr"), "eff")
    val h2 = Merge.scd2Apply(h1, upd("v3", "2024-03-01"), Seq("k"), Seq("attr"), "eff")
    val chain = h2.orderBy($"valid_from").collect()
      .map(r => (r.getString(1), r.getDate(2), Option(r.getDate(3))))
    assert(chain.toSeq == Seq(
      ("v1", d("2024-01-01"), Some(d("2024-02-01"))),
      ("v2", d("2024-02-01"), Some(d("2024-03-01"))),
      ("v3", d("2024-03-01"), None)))
    // replaying an old batch against the newer history must not fork it:
    // v2@02-01 is stale vs the current row's valid_from 03-01
    val replay = Merge.scd2Apply(h2, upd("v2", "2024-02-01"), Seq("k"), Seq("attr"), "eff")
    assert(replay.collect().map(r => (r.getString(1), r.getDate(2))).toSet ==
      h2.collect().map(r => (r.getString(1), r.getDate(2))).toSet)
  }
}
