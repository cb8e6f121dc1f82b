package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() = Files.createTempDirectory("graft-manifest").toString + "/tbl"

  private def base = spark.range(1, 101)
    .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" / 50).cast("long").as("p"))

  private def state(dir: String): Map[Long, (Double, Long)] =
    Manifest.read(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

  private def baseState =
    (1L to 100L).map(k => k -> (k * 1.0, k / 50)).toMap

  test("history: one row per retained commit with operation, monotone time, txn marker") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.append(spark, dir, Seq((200L, 2.0, 1L)).toDF("k", "v", "p"), "p")
    Manifest.upsert(spark, dir, Seq((5L, 55.0, 0L)).toDF("k", "v", "p"),
      Seq("k"), "p")
    Manifest.appendIfAbsent(spark, dir,
      Seq((300L, 3.0, 1L)).toDF("k", "v", "p"), "p", "hist_app", 7L)
    Manifest.compact(spark, dir, "p", smallBytes = Long.MaxValue / 2)
    val h = Manifest.history(spark, dir)
      .select("version", "operation", "txn_app_id", "txn_batch_id",
        "multi_table")
      .as[(Long, String, Option[String], Option[Long], Boolean)]
      .collect().toSeq
    assert(h.map(r => (r._1, r._2)) == Seq((1L, "CREATE"), (2L, "APPEND"),
      (3L, "UPSERT"), (4L, "APPEND"), (5L, "COMPACT")))
    assert(h(3)._3.contains("hist_app") && h(3)._4.contains(7L),
      "the exactly-once txn marker surfaces on its commit")
    assert(h.forall(!_._5), "no commit here was multi-table")
    val ts = Manifest.history(spark, dir).select("timestamp")
      .as[java.sql.Timestamp].collect().map(_.getTime).toSeq
    assert(ts == ts.sorted, "commit times are monotone by construction")
    // vacuum trims history WITH the data it described
    Manifest.vacuumOrphans(spark, dir, keepVersions = 2, staleMillis = 0L)
    assert(Manifest.history(spark, dir).select("version")
      .as[Long].collect().toSeq == Seq(4L, 5L))
  }

  test("detail: snapshot totals, visible columns, pruning config, DV count") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p", statsCols = Seq("v"),
      bloomCols = Seq("k"))
    Manifest.deleteMor(spark, dir, Seq((5L, 0L)).toDF("k", "p"),
      Seq("k"), "p")
    Manifest.renameColumn(spark, dir, "v", "amount")
    Manifest.addConstraint(spark, dir, "amount_pos", "amount > 0")
    val d = Manifest.detail(spark, dir).collect().head
    assert(d.getAs[Long]("version") == 4L)
    assert(d.getAs[Long]("num_rows") == 100L,
      "num_rows counts FILE rows (the DV'd row still occupies its file)")
    assert(d.getAs[Long]("num_files") >= 1 &&
      d.getAs[Long]("size_bytes") > 0)
    assert(d.getSeq[String](d.fieldIndex("columns")) == Seq("k", "amount", "p"))
    assert(d.getSeq[String](d.fieldIndex("stats_columns")) == Seq("v"),
      "pruning config is PHYSICAL — the stats slot keeps its birth name")
    assert(d.getSeq[String](d.fieldIndex("bloom_columns")) == Seq("k"))
    assert(d.getSeq[String](d.fieldIndex("constraints")) == Seq("amount_pos"))
    assert(d.getAs[Long]("num_dv_dirs") == 1L)
  }

  test("create / read round trip; append adds rows; versions accumulate") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    assert(state(dir) == baseState)
    assert(Manifest.versions(spark, dir) == Seq(1L))

    Manifest.append(spark, dir,
      Seq((200L, 2.5, 4L)).toDF("k", "v", "p"), "p")
    assert(state(dir) == baseState + (200L -> (2.5, 4L)))
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L))

    intercept[IllegalArgumentException] {
      Manifest.append(spark, dir, Seq((1L, "wrong")).toDF("k", "v"), "p")
    }
    // upsert rejects a partial-schema batch (it would silently null the
    // missing columns for every rewritten row in candidate files)
    intercept[IllegalArgumentException] {
      Manifest.upsert(spark, dir, Seq((1L, 0L)).toDF("k", "p"), Seq("k"), "p")
    }
    // delete rejects anything beyond keys :+ partitionCol
    intercept[IllegalArgumentException] {
      Manifest.delete(spark, dir,
        Seq((1L, 1.0, 0L)).toDF("k", "v", "p"), Seq("k"), "p")
    }
  }

  test("manifest stays slim: schema + stats config once on the sentinel, not per file entry") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p", statsCols = Seq("v"))
    Manifest.append(spark, dir, Seq((200L, 2.5, 4L)).toDF("k", "v", "p"), "p")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifests = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_manifests"))
      .map(_.getPath.toString)
    // the sentinel lives ONCE per manifest CHAIN: a linked (appended)
    // manifest carries only its batch's slim entries + the base pointer
    val counts = manifests.map { m =>
      val rows = spark.read.parquet(m)
        .select("path", "schema_ddl", "stat_cols").collect()
      val (sentinels, files) = rows.partition(_.getString(0).isEmpty)
      assert(sentinels.length <= 1)
      sentinels.foreach(s => assert(s.getString(1).nonEmpty &&
        s.getSeq[String](2) == Seq("v")))
      assert(files.nonEmpty && files.forall(r =>
        r.getString(1).isEmpty && r.getSeq[String](2).isEmpty),
        "file entries must not repeat the schema or stats config")
      sentinels.length
    }
    assert(counts.sum >= 1, "at least one manifest carries the sentinel")
  }

  test("two racing writers: exactly one claims a version; the retried loser lands on top") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    val start = new java.util.concurrent.CountDownLatch(1)
    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    def writer(k: Long): Thread = {
      val t = new Thread(() => {
        start.await()
        Manifest.withConflictRetry() {
          try Manifest.append(spark, dir,
            Seq((k, k.toDouble, 9L)).toDF("k", "v", "p"), "p")
          catch { case e: Throwable if Manifest.isConflict(e) =>
            conflicts.incrementAndGet(); throw e }
        }
      })
      t.start(); t
    }
    val ts = Seq(writer(1001L), writer(1002L))
    start.countDown()
    ts.foreach(_.join(120000))
    // both rows present, exactly three committed versions, loser's
    // retry folded on top of the winner's snapshot
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L, 3L))
    assert(state(dir) == baseState +
      (1001L -> (1001.0, 9L)) + (1002L -> (1002.0, 9L)))
  }

  test("crash injection: crash after staging but before pointer create leaves the old snapshot intact; rerun completes") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    val updates = Seq((10L, -1.0, 0L), (300L, 3.0, 6L)).toDF("k", "v", "p")
    // run the full upsert, then delete the v2 pointer: the on-disk state
    // is EXACTLY a crash between staging (data + manifest written) and
    // the commit — orphaned files present, pointer absent
    Manifest.upsert(spark, dir, updates, Seq("k"), "p")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_versions/v00000002"), false))
    assert(Manifest.versions(spark, dir) == Seq(1L))
    assert(state(dir) == baseState, "crashed writer must be invisible")
    // the rerun replays the same merge and commits; orphans stay garbage
    Manifest.upsert(spark, dir, updates, Seq("k"), "p")
    assert(state(dir) == baseState + (10L -> (-1.0, 0L)) + (300L -> (3.0, 6L)))
    // vacuum reclaims the crashed attempt's orphaned files
    assert(Manifest.vacuumOrphans(spark, dir, staleMillis = 0L) > 0)
    assert(state(dir) == baseState + (10L -> (-1.0, 0L)) + (300L -> (3.0, 6L)))
  }

  test("compact packs one large partition value into ~targetBytes files (bin-packing honors targetBytes)") {
    val dir = newDir()
    // ONE partition value: plain hash clustering can never split it
    val big = spark.range(0, 20000)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), lit(0L).as("p"))
    Manifest.create(spark, dir, big.filter($"k" < 10000), "p")
    Manifest.append(spark, dir, big.filter($"k" >= 10000), "p")
    val bytes = Manifest.read(spark, dir)
      .select(input_file_name()).distinct().count()
    assert(bytes == 2)
    val total = 2 * 80000L // ~ two parquet files of 10k (long,double,long) rows
    Manifest.compact(spark, dir, "p",
      smallBytes = 32L << 20, targetBytes = total / 4)
    val after = Manifest.read(spark, dir)
      .select(input_file_name()).distinct().count()
    assert(after >= 2,
      s"a single partition value must still split into ~targetBytes files (got $after)")
    assert(Manifest.read(spark, dir).count() == 20000)
    assert(Manifest.read(spark, dir).agg(sum($"v")).head.getDouble(0) ==
      (0 until 20000).map(_.toDouble).sum)
  }

  test("range pruning: min/max file stats skip files outside the predicate's bounds") {
    val dir = newDir()
    // one batch per partition value → 3 files with disjoint v ranges
    // (hash clustering within one batch may co-locate partition values)
    Manifest.create(spark, dir, base.filter($"p" === 0L), "p", statsCols = Seq("v"))
    Manifest.append(spark, dir, base.filter($"p" === 1L), "p")
    Manifest.append(spark, dir, base.filter($"p" === 2L), "p")
    val all = Manifest.read(spark, dir)
      .select(input_file_name()).distinct().count()
    val cands = Manifest.rangeCandidatePaths(spark, dir, "v",
      Some("10.0"), Some("20.0"))
    assert(cands.size < all,
      s"range read must open fewer files (${cands.size} vs $all)")
    val got = Manifest.readRange(spark, dir, "v", Some("10.0"), Some("20.0"))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got == (10L to 20L).toSet)
    // open-ended bound; and pruning survives an upsert's rewritten files
    Manifest.upsert(spark, dir,
      Seq((1L, 999.0, 0L)).toDF("k", "v", "p"), Seq("k"), "p")
    val hi = Manifest.readRange(spark, dir, "v", Some("150.0"), None)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(hi == Set(1L))
    val candsHi = Manifest.rangeCandidatePaths(spark, dir, "v", Some("150.0"), None)
    val allHi = Manifest.read(spark, dir)
      .select(input_file_name()).distinct().count()
    assert(candsHi.size < allHi)
  }

  test("mergeSchema append widens atomically on drift; missing/retyped columns still reject") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    // drift without opting in: loud reject (the round-trip contract)
    intercept[IllegalArgumentException] {
      Manifest.append(spark, dir,
        Seq((200L, 2.0, 4L, "x")).toDF("k", "v", "p", "w"), "p")
    }
    // opted in: ONE commit carries the widened schema + the data
    val vs = Manifest.versions(spark, dir)
    Manifest.append(spark, dir,
      Seq((200L, 2.0, 4L, "x")).toDF("k", "v", "p", "w"), "p",
      mergeSchema = true)
    assert(Manifest.versions(spark, dir).size == vs.size + 1)
    val rows = Manifest.read(spark, dir)
    assert(rows.columns.toSeq == Seq("k", "v", "p", "w"))
    assert(rows.filter($"k" === 200L).select("w").head().getString(0) == "x")
    assert(rows.filter($"w".isNull).count() == 100) // old files read null
    // post-widen, a batch carrying the new column appends plainly
    Manifest.append(spark, dir,
      Seq((201L, 2.1, 4L, "y")).toDF("k", "v", "p", "w"), "p")
    // but a batch MISSING an existing column is rejected even merged
    intercept[IllegalArgumentException] {
      Manifest.append(spark, dir,
        Seq((202L, 4L, "z")).toDF("k", "p", "w"), "p", mergeSchema = true)
    }
    // and retyping is rejected even merged
    intercept[IllegalArgumentException] {
      Manifest.append(spark, dir,
        Seq((203L, "oops", 4L, "z")).toDF("k", "v", "p", "w"), "p",
        mergeSchema = true)
    }
    assert(Manifest.read(spark, dir).count() == 102)
  }

  test("evolve adds a column metadata-only: same files, old rows read null, new appends carry it") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    val filesBefore = Manifest.read(spark, dir)
      .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    Manifest.evolve(spark, dir, Seq("tag" -> "STRING"))
    // metadata-only: version advanced, zero data files written
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L))
    val evolved = Manifest.read(spark, dir)
    assert(evolved.columns.toSeq == Seq("k", "v", "p", "tag"))
    val filesAfter = evolved
      .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    assert(filesAfter == filesBefore, "evolve must not rewrite any data file")
    assert(evolved.filter($"tag".isNotNull).isEmpty, "old rows read null")
    // old schema no longer appends; widened schema does
    intercept[IllegalArgumentException] {
      Manifest.append(spark, dir, Seq((300L, 3.0, 6L)).toDF("k", "v", "p"), "p")
    }
    Manifest.append(spark, dir,
      Seq((300L, 3.0, 6L, "new")).toDF("k", "v", "p", "tag"), "p")
    val got = Manifest.read(spark, dir).filter($"k" === 300L).collect()
    assert(got.length == 1 && got.head.getString(3) == "new")
    intercept[IllegalArgumentException] {
      Manifest.evolve(spark, dir, Seq("tag" -> "STRING")) // duplicate
    }
  }

  test("changes: version-diff change feed reads only changed files; unchanged rewritten rows cancel") {
    val dir = newDir()
    Manifest.create(spark, dir, base.filter($"p" =!= 1L), "p")
    Manifest.append(spark, dir, base.filter($"p" === 1L), "p")       // v2
    Manifest.upsert(spark, dir,                                      // v3
      Seq((10L, 99.0, 0L), (400L, 4.0, 0L)).toDF("k", "v", "p"), Seq("k"), "p")
    Manifest.delete(spark, dir, Seq((50L, 1L)).toDF("k", "p"), Seq("k"), "p") // v4

    def feed(a: Long, b: Long) = Manifest.changes(spark, dir, a, b)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(3))).toSet
    // v2 -> v3: partition 0 was rewritten, but only the touched rows surface
    assert(feed(2L, 3L) == Set(
      (10L, 10.0, "delete"), (10L, 99.0, "insert"), (400L, 4.0, "insert")))
    // v3 -> v4: pure delete
    assert(feed(3L, 4L) == Set((50L, 50.0, "delete")))
    // v1 -> v2: pure append (no file removed)
    assert(feed(1L, 2L).forall(_._3 == "insert") &&
      feed(1L, 2L).map(_._1) == (50L to 99L).toSet)
    // the feed composes: replaying v2->v4 inserts minus deletes onto v2
    // reproduces v4 (CDC correctness end-to-end)
    val v2 = Manifest.readVersion(spark, dir, 2L)
    val ch = Manifest.changes(spark, dir, 2L, 4L)
    val replayed = v2
      .unionByName(ch.filter($"change" === "insert").drop("change"))
      .exceptAll(ch.filter($"change" === "delete").drop("change"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val v4 = Manifest.read(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(replayed == v4)
  }

  test("two racing upserts both land (conflict retry refolds on the winner's snapshot)") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    val start = new java.util.concurrent.CountDownLatch(1)
    def writer(k: Long, v: Double): Thread = {
      val t = new Thread(() => {
        start.await()
        Manifest.withConflictRetry() {
          Manifest.upsert(spark, dir,
            Seq((k, v, k / 50)).toDF("k", "v", "p"), Seq("k"), "p")
        }
      })
      t.start(); t
    }
    val ts = Seq(writer(10L, -10.0), writer(60L, -60.0))
    start.countDown()
    ts.foreach(_.join(120000))
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L, 3L))
    val got = state(dir)
    assert(got(10L) == (-10.0, 0L) && got(60L) == (-60.0, 1L),
      "neither racing upsert may be lost")
    assert(got.size == 100)
  }

  test("sustained contention: 4 writers x 6 mixed commits all land exactly once") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    val start = new java.util.concurrent.CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // writer w upserts its own key range and MoR-deletes one key per
    // round; ranges are disjoint so the expected end state is exact
    def writer(w: Int): Thread = {
      val t = new Thread(() => {
        start.await()
        try (0 until 6).foreach { round =>
          val k = 1000L + w * 100 + round
          Manifest.withConflictRetry(attempts = 60) {
            Manifest.upsert(spark, dir,
              Seq((k, w * 1.0, k % 3)).toDF("k", "v", "p"), Seq("k"), "p")
          }
          if (round % 2 == 1) Manifest.withConflictRetry(attempts = 60) {
            Manifest.deleteMor(spark, dir,
              Seq((k, k % 3)).toDF("k", "p"), Seq("k"), "p")
          }
        } catch { case t: Throwable => failures.add(t) }
      })
      t.start(); t
    }
    val ts = (0 until 4).map(writer)
    start.countDown()
    ts.foreach(_.join(600000))
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")
    // every round committed exactly one version: 1 create + 4*6 upserts
    // + 4*3 MoR deletes = 37 versions, no lost updates, exact end state
    assert(Manifest.versions(spark, dir).size == 37)
    val got = state(dir)
    val expected = baseState ++ (for {
      w <- 0 until 4; round <- 0 until 6 if round % 2 == 0
      k = 1000L + w * 100 + round
    } yield k -> (w * 1.0, k % 3))
    assert(got == expected, "a concurrent commit was lost or duplicated")
  }

  test("overwrite replaces the snapshot atomically; old version still time-travels") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    val replacement = Seq((1L, 1.0, 0L), (2L, 2.0, 0L)).toDF("k", "v", "p")
    Manifest.overwrite(spark, dir, replacement, "p")
    assert(state(dir) == Map(1L -> (1.0, 0L), 2L -> (2.0, 0L)))
    assert(Manifest.readVersion(spark, dir, 1L).count() == 100)
    intercept[IllegalArgumentException] {
      Manifest.overwrite(spark, dir, Seq((1L, "x")).toDF("k", "v"), "p")
    }
  }

  test("upsert: update wins column-wise, new keys insert, untouched files carry by reference") {
    val dir = newDir()
    // partition 1 goes in as its OWN batch, so its files are isolated
    // (within one batch, hash clustering may co-locate partition
    // values in a file — the manifest records the mix and such a file
    // is then a legitimate rewrite candidate)
    Manifest.create(spark, dir, base.filter($"p" =!= 1L), "p")
    Manifest.append(spark, dir, base.filter($"p" === 1L), "p")
    val updates = (spark.range(10, 21) union spark.range(130, 141))
      .select($"id".as("k"), ($"id" * 10.0).as("v"),
        when($"id" >= 100, 2L).otherwise(0L).as("p"))
    Manifest.upsert(spark, dir, updates, Seq("k"), "p")
    val expect = baseState ++
      (10L to 20L).map(k => k -> (k * 10.0, 0L)).toMap ++
      (130L to 140L).map(k => k -> (k * 10.0, 2L)).toMap
    assert(state(dir) == expect)
    // pruning: partition 1's rows (keys 50..99) were NOT read — their
    // file set is byte-identical across the two versions
    def filesOfP1(v: Long) = Manifest.readVersion(spark, dir, v)
      .filter($"p" === 1L).select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(filesOfP1(2L) == filesOfP1(3L))
    // null-safe: an upsert with a null partition value works
    Manifest.upsert(spark, dir,
      Seq((500L, 5.0, Option.empty[Long])).toDF("k", "v", "p"), Seq("k"), "p")
    val withNull = Manifest.read(spark, dir)
      .filter($"k" === 500L).collect()
    assert(withNull.length == 1 && withNull.head.isNullAt(2))
  }

  test("delete: rows go, a fully-emptied partition just drops out of the manifest") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    // wipe ALL of partition 2 (key 100) and part of partition 0
    val dels = Seq((100L, 2L), (10L, 0L)).toDF("k", "p")
    Manifest.delete(spark, dir, dels, Seq("k"), "p")
    assert(state(dir) == baseState - 100L - 10L)
    assert(Manifest.read(spark, dir).filter($"p" === 2L).isEmpty)
    // delete everything: the table reads back empty but keeps schema
    Manifest.delete(spark, dir,
      Manifest.read(spark, dir).select("k", "p"), Seq("k"), "p")
    val empty = Manifest.read(spark, dir)
    assert(empty.isEmpty && empty.columns.toSeq == Seq("k", "v", "p"))
  }

  test("time travel: every committed version stays readable until vacuumed") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.upsert(spark, dir, Seq((1L, 99.0, 0L)).toDF("k", "v", "p"), Seq("k"), "p")
    Manifest.delete(spark, dir, Seq((2L, 0L)).toDF("k", "p"), Seq("k"), "p")
    def st(v: Long) = Manifest.readVersion(spark, dir, v)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(st(1L) == baseState)
    assert(st(2L) == baseState + (1L -> (99.0, 0L)))
    assert(st(3L) == baseState + (1L -> (99.0, 0L)) - 2L)
  }

  test("crash safety: staged-but-uncommitted work is invisible; commit CAS loses loudly") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    // simulate a writer that crashed after staging data + manifest but
    // BEFORE the pointer create: garbage files under data/ and
    // _manifests/ must not change what readers see
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((666L, 6.0, 0L)).toDF("k", "v", "p")
      .write.parquet(s"$dir/data/b-crashed-batch")
    Seq(("data/b-crashed-batch/whatever.parquet", Seq("0"), false, false,
        1L, 1L, "k BIGINT", Seq.empty[String], Seq.empty[String], Seq.empty[String]))
      .toDF("path", "values", "has_null", "overflow", "rows", "bytes",
        "schema_ddl", "stat_cols", "stat_mins", "stat_maxs")
      .write.parquet(s"$dir/_manifests/m-crashed")
    assert(state(dir) == baseState) // untouched
    // a lost CAS race: the next version pointer already exists
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_versions/v00000002"), false)
    out.write("m-thief".getBytes("UTF-8")); out.close()
    intercept[Exception] {
      Manifest.append(spark, dir, Seq((9L, 9.0, 0L)).toDF("k", "v", "p"), "p")
    }
  }

  test("compact folds small files; vacuum reclaims orphans but keeps kept versions readable") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.append(spark, dir, Seq((201L, 1.0, 5L)).toDF("k", "v", "p"), "p")
    Manifest.append(spark, dir, Seq((202L, 1.0, 5L)).toDF("k", "v", "p"), "p")
    val before = Manifest.read(spark, dir)
      .select(input_file_name()).distinct().count()
    Manifest.compact(spark, dir, "p", smallBytes = 32L << 20)
    val expect = baseState + (201L -> (1.0, 5L)) + (202L -> (1.0, 5L))
    assert(state(dir) == expect)
    val after = Manifest.read(spark, dir)
      .select(input_file_name()).distinct().count()
    assert(after < before, s"compact must shrink the file count ($before -> $after)")

    // vacuum to the latest 2 versions: both still read; older pointers gone
    val reclaimed = Manifest.vacuumOrphans(spark, dir, keepVersions = 2, staleMillis = 0L)
    assert(reclaimed > 0)
    assert(Manifest.versions(spark, dir).length == 2)
    assert(state(dir) == expect)
    val prev = Manifest.versions(spark, dir).head
    assert(Manifest.readVersion(spark, dir, prev).count() == 102)
    // and a full-history read of a dropped version now fails
    intercept[Exception] { Manifest.readVersion(spark, dir, 1L) }
  }

  test("partition-scoped compact (OPTIMIZE WHERE) folds only the named partition's files") {
    val dir = newDir()
    // non-spanning layout: the base holds ONLY partition 0 (a create
    // whose files span values would be a legitimate candidate — the
    // documented spanning caveat — and would muddy the assertion)
    val p0 = spark.range(1, 101)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), lit(0L).as("p"))
    Manifest.create(spark, dir, p0, "p")
    // fragment partitions 1 and 2 with small appends
    (1 to 3).foreach(i => Manifest.append(spark, dir,
      Seq((300L + i, 1.0, 1L)).toDF("k", "v", "p"), "p"))
    (1 to 3).foreach(i => Manifest.append(spark, dir,
      Seq((400L + i, 1.0, 2L)).toDF("k", "v", "p"), "p"))
    def filesOf(p: Long): Set[String] = Manifest.read(spark, dir)
      .where($"p" === p).select(input_file_name())
      .distinct().collect().map(_.getString(0)).toSet
    val p0Before = filesOf(0L)
    val p1Before = filesOf(1L)
    val p2Before = filesOf(2L)
    val folded = Manifest.compact(spark, dir, "p",
      smallBytes = 32L << 20, values = Seq("1"))
    assert(folded >= 3, s"the hot partition's small files must fold ($folded)")
    assert(filesOf(1L) != p1Before, "partition 1 must be rewritten")
    assert(filesOf(0L) == p0Before && filesOf(2L) == p2Before,
      "cold partitions' files must carry by reference, untouched")
    // content identical, and the cold partition folds on its own pass
    val expect = (1L to 100L).map(k => k -> (k * 1.0, 0L)).toMap ++
      (1 to 3).map(i => (300L + i) -> (1.0, 1L)) ++
      (1 to 3).map(i => (400L + i) -> (1.0, 2L))
    assert(state(dir) == expect)
    assert(Manifest.compact(spark, dir, "p",
      smallBytes = 32L << 20, values = Seq("2")) >= 3)
    assert(state(dir) == expect)
  }

  test("readTimestamp resolves like the DataSource's timestampAsOf") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.append(spark, dir, Seq((500L, 5.0, 0L)).toDF("k", "v", "p"), "p")
    val times = Manifest.versionTimes(spark, dir)
    assert(Manifest.readTimestamp(spark, dir,
      times.head._2.toString).count() == 100)
    assert(Manifest.readTimestamp(spark, dir,
      times.last._2.toString).count() == 101)
    val e = intercept[IllegalArgumentException] {
      Manifest.readTimestamp(spark, dir, (times.head._2 - 10).toString)
    }
    assert(e.getMessage.contains("vacuum"))
  }

  test("txn markers: appendIfAbsent applies each (appId, batchId) at most once") {
    val dir = newDir()
    assert(Manifest.lastTxn(spark, dir, "app") == None)
    // batch 0 creates the table, batch 1 appends
    assert(Manifest.appendIfAbsent(spark, dir, base, "p", "app", 0L))
    assert(Manifest.appendIfAbsent(spark, dir,
      Seq((200L, 2.5, 4L)).toDF("k", "v", "p"), "p", "app", 1L))
    val expect = baseState + (200L -> (2.5, 4L))
    assert(state(dir) == expect)
    assert(Manifest.lastTxn(spark, dir, "app") == Some(1L))

    // replaying either batch (the crash-between-sink-and-checkpoint
    // window) is a no-op: marker seen, nothing re-applied
    assert(!Manifest.appendIfAbsent(spark, dir, base, "p", "app", 0L))
    assert(!Manifest.appendIfAbsent(spark, dir,
      Seq((200L, 2.5, 4L)).toDF("k", "v", "p"), "p", "app", 1L))
    assert(state(dir) == expect)
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L))

    // a DIFFERENT app's batch 1 is independent — markers are per-app
    assert(Manifest.appendIfAbsent(spark, dir,
      Seq((300L, 3.5, 4L)).toDF("k", "v", "p"), "p", "other", 1L))
    assert(Manifest.lastTxn(spark, dir, "other") == Some(1L))
    assert(Manifest.lastTxn(spark, dir, "app") == Some(1L))

    // ordinary (marker-less) commits between batches don't disturb the
    // per-app watermark: newest matching marker wins
    Manifest.append(spark, dir, Seq((400L, 4.5, 4L)).toDF("k", "v", "p"), "p")
    assert(Manifest.lastTxn(spark, dir, "app") == Some(1L))
    assert(Manifest.appendIfAbsent(spark, dir,
      Seq((401L, 4.6, 4L)).toDF("k", "v", "p"), "p", "app", 2L))
    assert(Manifest.lastTxn(spark, dir, "app") == Some(2L))
  }

  test("bloom point lookup: probes skip files that cannot contain the key, answer is exact") {
    val dir = newDir()
    def band(lo: Long, hi: Long) = spark.range(lo, hi)
      .select($"id".as("k"), ($"id" * 1.0).as("v"),
        ($"id" / 1000).cast("long").as("p"))
    // three batches with disjoint key bands; no min/max stats on k are
    // configured and point probes never see the partition column, so
    // ONLY the bloom on k can separate the files
    Manifest.create(spark, dir, band(1, 1001), "p", bloomCols = Seq("k"))
    Manifest.append(spark, dir, band(1001, 2001), "p")
    Manifest.append(spark, dir, band(2001, 3001), "p")

    val all = Manifest.read(spark, dir)
      .select(input_file_name()).distinct().count()
    val cands = Manifest.pointCandidatePaths(spark, dir, "k", "1500")
    assert(cands.size < all,
      s"bloom must skip files (candidates ${cands.size} of $all)")
    assert(Manifest.readPoint(spark, dir, "k", "1500")
      .select($"v").as[Double].collect().toSeq == Seq(1500.0))
    // a key in no band: typically zero candidates (FP-rate permitting),
    // always an empty answer
    assert(Manifest.readPoint(spark, dir, "k", "999999").count() == 0)

    // rewrites rebuild blooms for the rewritten files: the moved row is
    // still found afterwards
    Manifest.upsert(spark, dir,
      Seq((1500L, 42.0, 1L)).toDF("k", "v", "p"), Seq("k"), "p")
    assert(Manifest.readPoint(spark, dir, "k", "1500")
      .select($"v").as[Double].collect().toSeq == Seq(42.0))

    // vacuum keeps the _bloom side relations of live batches
    Manifest.vacuumOrphans(spark, dir, keepVersions = 1, staleMillis = 0L)
    val candsAfter = Manifest.pointCandidatePaths(spark, dir, "k", "42")
    assert(candsAfter.size < Manifest.read(spark, dir)
      .select(input_file_name()).distinct().count(),
      "bloom pruning must survive vacuum")
    assert(Manifest.readPoint(spark, dir, "k", "42")
      .select($"v").as[Double].collect().toSeq == Seq(42.0))
  }

  test("readPartitions prunes to matching files and returns the exact filter answer") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p") // p in 0..2
    Manifest.append(spark, dir,
      Seq((300L, 3.0, 7L), (301L, 3.1, 8L)).toDF("k", "v", "p"), "p")
    val all = Manifest.read(spark, dir)
      .select(input_file_name()).distinct().count()
    val pruned = Manifest.readPartitions(spark, dir, "p", Seq("7"))
    assert(pruned.select(input_file_name()).distinct().count() < all,
      "partition read must open fewer files than the full table")
    assert(pruned.select($"k").as[Long].collect().toSeq == Seq(300L))
    // answer parity with the unpruned filter
    val plain = Manifest.read(spark, dir).filter($"p" === 7L)
      .select($"k").as[Long].collect().toSeq
    assert(pruned.select($"k").as[Long].collect().toSeq == plain)
  }
}
