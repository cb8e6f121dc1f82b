package graft.io

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Manifest

/** The `graft-manifest` BATCH DataSource: `spark.read.format(...)` with
  * versionAsOf / timestampAsOf time travel, save-mode writes, planner
  * integration (the pruning FileIndex rides under the stock parquet
  * scan), the DV-masked fallback relation, and the SQL `CREATE TABLE
  * ... USING graft-manifest` surface. */
class ManifestRelationSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() = Files.createTempDirectory("graft-mrel").toString

  private def base = spark.range(1, 61)
    .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" % 3).as("p"))

  private def readFmt(dir: String, opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.read.format("graft-manifest")) {
      case (b, (k, v)) => b.option(k, v)
    }.load(dir)

  private def rows(df: DataFrame): Set[(Long, Double, Long)] =
    df.select("k", "v", "p").as[(Long, Double, Long)].collect().toSet

  test("save modes: create, ErrorIfExists refusal, Ignore no-op, append, overwrite") {
    val dir = s"${newDir()}/tbl"
    base.write.format("graft-manifest").option("partitionCol", "p").save(dir)
    assert(rows(readFmt(dir)) == rows(base))

    // default mode is ErrorIfExists: a second create refuses
    val e = intercept[Exception] {
      base.write.format("graft-manifest").option("partitionCol", "p").save(dir)
    }
    assert(e.getMessage.contains("already exists"))
    // Ignore: existing table untouched, no new version
    base.limit(1).write.format("graft-manifest").mode("ignore")
      .option("partitionCol", "p").save(dir)
    assert(Manifest.latestVersion(spark, dir).contains(1L))

    val extra = Seq((100L, 9.0, 1L)).toDF("k", "v", "p")
    extra.write.format("graft-manifest").mode("append")
      .option("partitionCol", "p").save(dir)
    assert(rows(readFmt(dir)) == rows(base) + ((100L, 9.0, 1L)))

    val replacement = Seq((7L, 7.0, 0L)).toDF("k", "v", "p")
    replacement.write.format("graft-manifest").mode("overwrite")
      .option("partitionCol", "p").save(dir)
    assert(rows(readFmt(dir)) == Set((7L, 7.0, 0L)))
    // overwrite was a commit, not a truncation: history time-travels
    assert(rows(readFmt(dir, "versionAsOf" -> "2")) ==
      rows(base) + ((100L, 9.0, 1L)))
  }

  test("partitionBy spelling works and disagreeing specs refuse") {
    val dir = s"${newDir()}/tbl"
    base.write.format("graft-manifest").partitionBy("p").save(dir)
    assert(rows(readFmt(dir)) == rows(base))
    val e = intercept[Exception] {
      base.write.format("graft-manifest").mode("append").partitionBy("p")
        .option("partitionCol", "k").save(dir)
    }
    assert(e.getMessage.contains("exactly ONE partition column"))
    // agreement between the two spellings is case-insensitive, like
    // every other column comparison in the stack
    Seq((500L, 5.0, 1L)).toDF("k", "v", "p")
      .write.format("graft-manifest").mode("append").partitionBy("P")
      .option("partitionCol", "p").save(dir)
    assert(readFmt(dir).count() == 61)
  }

  test("SaveMode.Ignore no-ops on an existing table even with stale create-time options") {
    val dir = s"${newDir()}/tbl"
    def createIfAbsent(): Unit =
      base.write.format("graft-manifest").mode("ignore")
        .option("partitionCol", "p").option("statsCols", "k").save(dir)
    createIfAbsent() // creates, stats configured
    createIfAbsent() // MUST no-op — not throw on the stale statsCols
    assert(Manifest.latestVersion(spark, dir).contains(1L))
    // the late-reconfiguration refusal still fires on writing modes
    val e = intercept[Exception] {
      base.write.format("graft-manifest").mode("append")
        .option("partitionCol", "p").option("statsCols", "v").save(dir)
    }
    assert(e.getMessage.contains("CREATE only"))
  }

  test("pushed-filter translation: polarity-aware composites all translate") {
    // sources.Filter is SEALED and every leaf currently translates
    // exactly, so the widened-child-under-NOT narrowing can't be
    // constructed here — the polarity rule lives in toColumn/exact's
    // structure (NOT and OR route through the exact-only translator;
    // only AND may take the one-sided widening). This pins the
    // composites that ARE constructible.
    import org.apache.spark.sql.sources
    assert(ManifestRelation.toColumn(sources.Not(
      sources.And(sources.EqualTo("k", 1L),
        sources.GreaterThan("k", 0L)))).isDefined)
    assert(ManifestRelation.toColumn(sources.Or(
      sources.Not(sources.EqualTo("k", 1L)),
      sources.AlwaysFalse())).isDefined)
    assert(ManifestRelation.toColumn(sources.And(
      sources.AlwaysTrue(), sources.In("k", Array(1L, 2L)))).isDefined)
  }

  test("versionAsOf parity with Manifest.readVersion; bad/mixed options refuse") {
    val dir = s"${newDir()}/tbl"
    Manifest.create(spark, dir, base, "p")
    Manifest.append(spark, dir, Seq((200L, 2.0, 2L)).toDF("k", "v", "p"), "p")
    Manifest.delete(spark, dir, Seq((1L, 1L)).toDF("k", "p"), Seq("k"), "p")
    (1L to 3L).foreach { v =>
      assert(rows(readFmt(dir, "versionAsOf" -> v.toString)) ==
        rows(Manifest.readVersion(spark, dir, v)), s"v$v diverged")
    }
    val e = intercept[Exception] {
      readFmt(dir, "versionAsOf" -> "1", "timestampAsOf" -> "2026-01-01")
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("timestampAsOf resolves via monotone IN-COMMIT times; pre-history refuses loudly") {
    val dir = s"${newDir()}/tbl"
    Manifest.create(spark, dir, base, "p")
    Manifest.append(spark, dir, Seq((200L, 2.0, 2L)).toDF("k", "v", "p"), "p")
    Manifest.append(spark, dir, Seq((300L, 3.0, 0L)).toDF("k", "v", "p"), "p")
    // pin the pointers' in-commit ts: lines so the test is
    // clock-independent (raw rewrite — a test-only liberty)
    val (fs, root) = (new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration), new Path(dir))
    def setT(v: Long, t: Long): Unit = {
      val p = new Path(root, f"_versions/v$v%08d")
      val in = fs.open(p)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList finally in.close()
      val out = lines.filterNot(_.startsWith("ts:")) :+ s"ts:$t"
      fs.delete(p, false)
      val os = fs.create(p, false)
      try os.write(out.mkString("\n").getBytes("UTF-8")) finally os.close()
      // mtime deliberately WRONG (now ≫ t): resolution must not use it
    }
    setT(1L, 1000000L); setT(2L, 2000000L); setT(3L, 3000000L)
    assert(rows(readFmt(dir, "timestampAsOf" -> "1500000")) ==
      rows(Manifest.readVersion(spark, dir, 1L)))
    assert(rows(readFmt(dir, "timestampAsOf" -> "2000000")) ==
      rows(Manifest.readVersion(spark, dir, 2L)))
    // at or past the newest commit reads the tip
    assert(rows(readFmt(dir, "timestampAsOf" -> "99999999999")) ==
      rows(Manifest.read(spark, dir)))
    val e = intercept[IllegalArgumentException] {
      readFmt(dir, "timestampAsOf" -> "999999")
    }
    assert(e.getMessage.contains("predates the earliest retained commit"))
    // a skewed middle pointer (in-commit ts BELOW its predecessor's)
    // cannot make resolution non-monotone: the running max reorders
    // time, not versions
    setT(2L, 500000L)
    assert(rows(readFmt(dir, "timestampAsOf" -> "1500000")) ==
      rows(Manifest.readVersion(spark, dir, 2L)),
      "the adjusted series floors v2's time at v1's")
    // LEGACY pointer (no ts: line at all) falls back to the file mtime
    val p3 = new Path(root, f"_versions/v${3L}%08d")
    val in3 = fs.open(p3)
    val noTs = try scala.io.Source.fromInputStream(in3, "UTF-8")
      .getLines().toList.filterNot(_.startsWith("ts:"))
      finally in3.close()
    fs.delete(p3, false)
    val os3 = fs.create(p3, false)
    try os3.write(noTs.mkString("\n").getBytes("UTF-8")) finally os3.close()
    fs.setTimes(p3, 3000000L, -1)
    assert(rows(readFmt(dir, "timestampAsOf" -> "3000000")) ==
      rows(Manifest.readVersion(spark, dir, 3L)),
      "a pre-ts-line pointer must still resolve via its mtime")
  }

  test("no live DVs: the batch relation IS the pruning-FileIndex parquet scan") {
    val dir = s"${newDir()}/tbl"
    Manifest.create(spark, dir, base, "p", statsCols = Seq("k"))
    val df = readFmt(dir, "partitionCol" -> "p").where($"p" === 1L && $"k" < 10L)
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected the stock FileSourceScan (codegen path)")
    // partition-value-set + stats pruning fired during planning: only
    // files that can hold p=1 ∧ k<10 are listed
    val opened = scans.head.inputRDDs().map(_.partitions.length).sum
    assert(rows(df) == rows(base.where($"p" === 1L && $"k" < 10L)))
    val all = readFmt(dir).queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head.inputRDDs().map(_.partitions.length).sum
    assert(opened <= all, s"pruned scan opened $opened vs full $all")
  }

  test("live DVs switch to the masked relation: answers stay exact, filters still apply") {
    val dir = s"${newDir()}/tbl"
    Manifest.create(spark, dir, base, "p")
    Manifest.deleteMor(spark, dir, Seq((5L, 2L), (6L, 0L)).toDF("k", "p"),
      Seq("k"), "p")
    val got = readFmt(dir)
    assert(rows(got) == rows(base.where(!$"k".isin(5L, 6L))),
      "DV-deleted rows must not resurrect through the batch relation")
    // pushed filters round-trip through the nested masked scan
    assert(rows(got.where($"k" >= 10L && $"p" =!= 1L)) ==
      rows(base.where($"k" >= 10L && $"p" =!= 1L && !$"k".isin(5L, 6L))))
    assert(got.where($"k".isNotNull).count() == 58L)
    // compaction materializes the DVs into rewritten files — answers
    // must be unchanged through the relation either way
    Manifest.compact(spark, dir, "p")
    assert(rows(readFmt(dir)) == rows(base.where(!$"k".isin(5L, 6L))))
    // a whole-snapshot overwrite retires every DV: the relation drops
    // back to the direct pruning-FileIndex parquet scan
    Manifest.overwrite(spark, dir, base, "p")
    val scans = readFmt(dir).queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "a DV-free snapshot reads via the direct scan")
  }

  test("SQL surface: CREATE TABLE USING graft-manifest, SELECT, and time travel") {
    val dir = s"${newDir()}/tbl"
    Manifest.create(spark, dir, base, "p")
    Manifest.append(spark, dir, Seq((500L, 5.0, 1L)).toDF("k", "v", "p"), "p")
    spark.sql("DROP TABLE IF EXISTS mrel_sql")
    spark.sql(s"CREATE TABLE mrel_sql USING `graft-manifest` " +
      s"OPTIONS (path '$dir', partitionCol 'p')")
    try {
      assert(spark.sql("SELECT sum(k) AS s FROM mrel_sql").as[Long].head() ==
        base.agg(sum($"k")).as[Long].head() + 500L)
      spark.sql("DROP TABLE IF EXISTS mrel_sql_v1")
      spark.sql(s"CREATE TABLE mrel_sql_v1 USING `graft-manifest` " +
        s"OPTIONS (path '$dir', versionAsOf '1')")
      try assert(spark.sql("SELECT count(*) AS c FROM mrel_sql_v1")
        .as[Long].head() == 60L)
      finally spark.sql("DROP TABLE mrel_sql_v1")
    } finally spark.sql("DROP TABLE mrel_sql")
  }

  test("a small mapped table still broadcast-joins: sizeInBytes is the snapshot's, not the V1 default") {
    val dir = s"${newDir()}/tbl"
    Manifest.create(spark, dir, base, "p")
    Manifest.renameColumn(spark, dir, "v", "amount")
    val small = spark.read.format("graft-manifest").load(dir) // masked venue
    val big = spark.range(1, 100000)
      .select($"id".as("k"), ($"id" % 7).as("g"))
    val joined = big.join(small, Seq("k"))
    assert(joined.count() == 60)
    // the plan sits under the AQE wrapper: assert on its rendering
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the 60-row mapped table must plan as the broadcast side; the V1 " +
        s"default sizeInBytes would force a sort-merge join:\n${plan.take(2000)}")
  }

  test("CTAS: CREATE TABLE ... USING graft-manifest AS SELECT creates and reads back") {
    val dir = s"${newDir()}/tbl"
    base.createOrReplaceTempView("mrel_ctas_src")
    spark.sql("DROP TABLE IF EXISTS mrel_ctas")
    spark.sql(s"CREATE TABLE mrel_ctas USING `graft-manifest` " +
      s"OPTIONS (path '$dir', partitionCol 'p') " +
      "AS SELECT * FROM mrel_ctas_src WHERE k <= 10")
    try {
      assert(spark.sql("SELECT count(*) AS c FROM mrel_ctas")
        .as[Long].head() == 10L)
      // the CTAS landed as a real manifest commit, not a side write
      assert(Manifest.latestVersion(spark, dir).contains(1L))
      assert(rows(Manifest.read(spark, dir)) == rows(base.where($"k" <= 10)))
    } finally spark.sql("DROP TABLE mrel_ctas")
  }

  test("write-side contract refusals: time-travel options, late stats reconfiguration") {
    val dir = s"${newDir()}/tbl"
    Manifest.create(spark, dir, base, "p")
    val e1 = intercept[Exception] {
      base.write.format("graft-manifest").mode("append")
        .option("partitionCol", "p").option("versionAsOf", "1").save(dir)
    }
    assert(e1.getMessage.contains("read options"))
    val e2 = intercept[Exception] {
      base.write.format("graft-manifest").mode("append")
        .option("partitionCol", "p").option("statsCols", "k").save(dir)
    }
    assert(e2.getMessage.contains("CREATE only"))
  }
}
