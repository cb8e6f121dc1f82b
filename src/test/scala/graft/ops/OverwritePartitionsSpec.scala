package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Manifest.overwritePartitions]] — dynamic partition overwrite
  * under snapshot isolation: replaced partitions swap, untouched
  * partitions carry BY REFERENCE (same files, no rewrite), spanning
  * files rewrite only their kept rows, and the whole change is one
  * atomic commit. */
class OverwritePartitionsSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() =
    Files.createTempDirectory("graft-owp").toString + "/tbl"

  private def paths(dir: String): Set[String] =
    Manifest.loadSnapshot(spark, dir).entries.map(_.path).toSet

  private def state(dir: String): Set[(Long, Double, Option[Long])] =
    Manifest.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  test("replaced partitions swap; untouched partitions carry by reference") {
    val dir = newDir()
    // three partitions written as three separate appends → separate
    // files per partition (single-partition batches cannot span)
    Manifest.create(spark, dir,
      Seq((1L, 1.0, 0L), (2L, 2.0, 0L)).toDF("k", "v", "p"), "p")
    Manifest.append(spark, dir,
      Seq((3L, 3.0, 1L), (4L, 4.0, 1L)).toDF("k", "v", "p"), "p")
    Manifest.append(spark, dir,
      Seq((5L, 5.0, 2L)).toDF("k", "v", "p"), "p")
    val before = paths(dir)
    val untouched = Manifest.loadSnapshot(spark, dir).entries
      .filterNot(_.values.contains("1")).map(_.path).toSet
    assert(untouched.nonEmpty)

    Manifest.overwritePartitions(spark, dir,
      Seq((30L, 30.0, 1L)).toDF("k", "v", "p"), "p")
    val after = paths(dir)
    assert(untouched.subsetOf(after),
      "files of untouched partitions must carry by reference (no rewrite)")
    assert(state(dir).map(t => (t._1, t._2, t._3.get)) == Set(
      (1L, 1.0, 0L), (2L, 2.0, 0L), (30L, 30.0, 1L), (5L, 5.0, 2L)),
      "partition 1 replaced wholesale, partitions 0 and 2 intact")
    // the swap is one new version; time travel still sees the old rows
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L, 3L, 4L))
    assert(Manifest.readVersion(spark, dir, 3L).count() == 5)
    // every old file of the replaced partition dropped from the manifest
    assert((before -- after).forall(p =>
      Manifest.loadSnapshot(spark, dir).entries.forall(_.path != p)))
  }

  test("spanning files: untouched-partition rows survive via kept-row rewrite") {
    val dir = newDir()
    // 12 partition values through 4 shuffle tasks → files hold several
    // values each, so replacing ONE value forces the spanning path
    val wide = spark.range(0, 120)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" % 12).as("p"))
    Manifest.create(spark, dir, wide, "p")
    val snap = Manifest.loadSnapshot(spark, dir)
    assert(snap.entries.exists(_.values.size > 1),
      "precondition: at least one file must span partition values")

    Manifest.overwritePartitions(spark, dir,
      Seq((1000L, -1.0, 3L)).toDF("k", "v", "p"), "p")
    val got = state(dir).map(t => (t._1, t._2, t._3.get))
    val expected = (0L until 120L).filterNot(_ % 12 == 3)
      .map(k => (k, k * 1.0, k % 12)).toSet + ((1000L, -1.0, 3L))
    assert(got == expected,
      "rows of untouched partitions inside spanning files must survive")
  }

  test("a null partition value replaces only the null partition") {
    val dir = newDir()
    Manifest.create(spark, dir,
      Seq((1L, 1.0, Some(0L)), (2L, 2.0, Option.empty[Long]))
        .toDF("k", "v", "p"), "p")
    Manifest.overwritePartitions(spark, dir,
      Seq((20L, 20.0, Option.empty[Long])).toDF("k", "v", "p"), "p")
    assert(state(dir) == Set((1L, 1.0, Some(0L)), (20L, 20.0, None)),
      "null partition replaced; non-null partition intact")
    // and the inverse: replacing partition 0 must not touch the nulls
    Manifest.overwritePartitions(spark, dir,
      Seq((10L, 10.0, Some(0L))).toDF("k", "v", "p"), "p")
    assert(state(dir) == Set((10L, 10.0, Some(0L)), (20L, 20.0, None)))
  }

  test("DV'd rows neither resurrect through the rewrite nor unmask on carried files") {
    val dir = newDir()
    val wide = spark.range(0, 60)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" % 6).as("p"))
    Manifest.create(spark, dir, wide, "p")
    // MoR-delete one row in a partition that will be REPLACED-adjacent
    // (spanning rewrite reads it) and one in a fully untouched file
    Manifest.deleteMor(spark, dir,
      Seq((4L, 4L), (11L, 5L)).toDF("k", "p"), Seq("k"), "p")
    Manifest.overwritePartitions(spark, dir,
      Seq((1000L, -1.0, 0L)).toDF("k", "v", "p"), "p")
    val ks = Manifest.read(spark, dir).select("k").as[Long].collect().toSet
    assert(!ks.contains(4L) && !ks.contains(11L),
      "MoR-deleted rows must stay deleted across the partition overwrite")
    assert(ks.contains(1000L) && !ks.contains(0L) && !ks.contains(6L),
      "partition 0 replaced")
    assert(ks.contains(5L) && ks.contains(10L), "other partitions intact")
  }

  test("TimestampType partition col: a cross-timezone session never drops files unread") {
    // Recorded partition values are writer-session-timezone string
    // renderings, unsound to compare across sessions (that is exactly
    // why partitionValuesSafe disables pruning for TimestampType).
    // The wholesale file drop must be disabled too: a reader session
    // an hour east renders a DIFFERENT instant to the same string, so
    // "every recorded value is replaced" proves nothing — a file
    // dropped on that evidence silently loses its rows.
    val dir = newDir()
    val savedTz = spark.conf.get("spark.sql.session.timeZone")
    def mk(k: Long, v: Double, ts: String) =
      Seq((k, v)).toDF("k", "v").withColumn("p", to_timestamp(lit(ts)))
    try {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      // instant 12:00Z, recorded under UTC as "2024-03-01 12:00:00"
      Manifest.create(spark, dir, mk(1L, 1.0, "2024-03-01 12:00:00"), "p")
      // an hour east, the SAME string now names instant 11:00Z — a
      // different partition than the stored row's
      spark.conf.set("spark.sql.session.timeZone", "GMT+01:00")
      Manifest.overwritePartitions(spark, dir,
        mk(9L, 9.0, "2024-03-01 12:00:00"), "p")
      val out = Manifest.read(spark, dir).select("k").as[Long]
        .collect().toSet
      assert(out == Set(1L, 9L),
        s"the 12:00Z row must survive a replace of 11:00Z, got $out")
    } finally spark.conf.set("spark.sql.session.timeZone", savedTz)
  }

  test("overwritePartitions racing a concurrent append: both land, exact final state") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.racycas.impl", classOf[RacyCasFileSystem].getName)
    hconf.set(LogStore.ConfPrefix + "racycas", classOf[JvmCasLogStore].getName)
    val dir = "racycas://" +
      Files.createTempDirectory("graft-owrace").toString + "/tbl"
    Manifest.create(spark, dir,
      Seq((1L, 1.0, 0L), (2L, 2.0, 1L)).toDF("k", "v", "p"), "p")
    val start = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def racer(body: => Unit) = new Thread(() => {
      start.await()
      try body catch { case t: Throwable => errs.add(t) }
    })
    // the overwrite carries its own conflict retry now (restage on the
    // fresh snapshot); the raw append gets the standard caller wrap
    val t1 = racer(Manifest.overwritePartitions(spark, dir,
      Seq((20L, 20.0, 1L)).toDF("k", "v", "p"), "p"))
    val t2 = racer(Manifest.withConflictRetry() {
      Manifest.append(spark, dir,
        Seq((3L, 3.0, 2L)).toDF("k", "v", "p"), "p")
    })
    t1.start(); t2.start(); start.countDown()
    t1.join(120000); t2.join(120000)
    assert(errs.isEmpty, s"both writers must land: $errs")
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L, 3L))
    assert(state(dir).map(t => (t._1, t._2, t._3.get)) == Set(
      (1L, 1.0, 0L), (20L, 20.0, 1L), (3L, 3.0, 2L)),
      "partition 1 replaced, partition 0 intact, append present — " +
        "in either commit order")
  }

  test("empty batch is a no-op; schema drift is rejected loudly") {
    val dir = newDir()
    Manifest.create(spark, dir,
      Seq((1L, 1.0, 0L)).toDF("k", "v", "p"), "p")
    val v0 = Manifest.versions(spark, dir)
    Manifest.overwritePartitions(spark, dir,
      Seq.empty[(Long, Double, Long)].toDF("k", "v", "p"), "p")
    assert(Manifest.versions(spark, dir) == v0, "empty batch commits nothing")
    intercept[IllegalArgumentException] {
      Manifest.overwritePartitions(spark, dir,
        Seq((1L, 0L)).toDF("k", "p"), "p")
    }
  }
}
