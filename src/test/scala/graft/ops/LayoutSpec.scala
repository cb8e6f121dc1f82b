package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftExpressions
import graft.io.Sources

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case f: FileSourceScanExec =>
      f.metrics("numOutputRows").value
    }.sum
  }

  test("zorder2 interleaves bits; masks to 31 bits; null-propagates") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (1L << 40 | 6L, 9L), (-1L, 2L))
      .toDF("x", "y")
      .select($"x", $"y", GraftExpressions.zorder2($"x", $"y").as("z"))
      .collect()
    def ref(x: Long, y: Long): Long = {
      val (mx, my) = (x & 0x7FFFFFFFL, y & 0x7FFFFFFFL)
      (0 until 31).foldLeft(0L)((z, i) =>
        z | ((mx >>> i) & 1L) << (2 * i) | ((my >>> i) & 1L) << (2 * i + 1))
    }
    rows.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1)),
        s"zorder2(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // spot-check the curve: (1,0)->1, (0,1)->2, (1,1)->3, (5,3)->exp
    assert(ref(1, 0) == 1L && ref(0, 1) == 2L && ref(1, 1) == 3L)
    val nulls = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(GraftExpressions.zorder2($"x", $"y")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("zorder3 interleaves three ways; masks to 21 bits; null-propagates") {
    val rows = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (1L, 1L, 1L), (5L, 3L, 6L), (0x1FFFFFL, 0x1FFFFFL, 0x1FFFFFL),
      (1L << 40 | 6L, 9L, 2L), (-1L, 2L, 3L))
      .toDF("x", "y", "z")
      .select($"x", $"y", $"z",
        GraftExpressions.zorder3($"x", $"y", $"z").as("m"))
      .collect()
    def ref(x: Long, y: Long, z: Long): Long = {
      val (mx, my, mz) = (x & 0x1FFFFFL, y & 0x1FFFFFL, z & 0x1FFFFFL)
      (0 until 21).foldLeft(0L)((a, i) =>
        a | ((mx >>> i) & 1L) << (3 * i) |
          ((my >>> i) & 1L) << (3 * i + 1) |
          ((mz >>> i) & 1L) << (3 * i + 2))
    }
    rows.foreach { r =>
      assert(r.getLong(3) == ref(r.getLong(0), r.getLong(1), r.getLong(2)),
        s"zorder3(${r.getLong(0)}, ${r.getLong(1)}, ${r.getLong(2)})")
    }
    assert(ref(1, 0, 0) == 1L && ref(0, 1, 0) == 2L && ref(0, 0, 1) == 4L &&
      ref(1, 1, 1) == 7L)
    val nulls = Seq((Some(1L), Option.empty[Long], Some(2L)))
      .toDF("x", "y", "z")
      .select(GraftExpressions.zorder3($"x", $"y", $"z")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("hilbert2: complete neighbor-walk over a 64×64 grid; masks to 31 bits; null-propagates") {
    // full correctness certificate on a sub-grid: the 31-level Hilbert
    // index restricted to [0,64)² is a bijection onto [0,4096) whose
    // CONSECUTIVE positions are always grid neighbors — the defining
    // property Morton lacks (its curve jumps across quadrant blocks),
    // and the reason Hilbert files carry tighter bounding boxes
    val pts = spark.range(0, 4096).select(
      ($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
      .select($"x", $"y", GraftExpressions.hilbert2($"x", $"y").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pts.map(_._3).toSet == (0L until 4096L).toSet,
      "hilbert2 over [0,64)² must be a bijection onto [0,4096)")
    val path = pts.sortBy(_._3)
    path.sliding(2).foreach { w =>
      val (a, b) = (w(0), w(1))
      assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2) == 1,
        s"consecutive hilbert positions must be grid neighbors: $a -> $b")
    }
    // masking to the low 31 bits (zorder2's contract) on big/negative
    // inputs, against an independent re-derivation of xy2d
    def ref(x0: Long, y0: Long): Long = {
      var x = x0 & 0x7FFFFFFFL; var y = y0 & 0x7FFFFFFFL
      var d = 0L; var s = 1L << 30
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val big = Seq((0x7FFFFFFFL, 0x7FFFFFFFL), (1L << 40 | 6L, 9L), (-1L, 2L))
      .toDF("x", "y")
      .select($"x", $"y", GraftExpressions.hilbert2($"x", $"y").as("d"))
      .collect()
    big.foreach(r => assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1)),
      s"hilbert2(${r.getLong(0)}, ${r.getLong(1)})"))
    // interpreted eval (no-codegen context) agrees with the codegen path
    val e = GraftExpressions.Hilbert2(
      org.apache.spark.sql.catalyst.expressions.Literal(123456789L),
      org.apache.spark.sql.catalyst.expressions.Literal(987654321L))
    assert(e.eval(null) == ref(123456789L, 987654321L))
    val nulls = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(GraftExpressions.hilbert2($"x", $"y")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("z-ordered layout prunes row groups on BOTH dimensions; random layout scans everything") {
    val orders = Sources.table(spark, "/root/testdata/sf0.01", "orders")
      .select($"o_orderkey", $"o_custkey",
        datediff($"o_orderdate", lit("1995-01-01").cast("date")).cast("long").as("day"))
    val total = orders.count()
    val base = Files.createTempDirectory("graft-layout").toString

    // tiny row groups so min/max pruning is observable at test scale —
    // the granule is 128 MB at lake scale, same mechanism
    Layout.writeZOrdered(orders, $"o_custkey", $"day", s"$base/zordered",
      numFiles = 4, blockSize = Some(1024))
    // control layout: generation order — custkey and day are i.i.d. per
    // row, so every row group spans both full ranges and nothing prunes
    orders.repartition(4)
      .write.mode("overwrite").option("parquet.block.size", "1024")
      .parquet(s"$base/random")

    val z = spark.read.parquet(s"$base/zordered")
    val r = spark.read.parquet(s"$base/random")
    for (pred <- Seq($"o_custkey" === 777L, $"day".between(400L, 430L))) {
      val zRows = scannedRows(z.filter(pred))
      val rRows = scannedRows(r.filter(pred))
      info(s"pred=$pred scanned z=$zRows random=$rRows total=$total")
      assert(rRows > total * 3 / 4,
        s"random layout unexpectedly pruned ($rRows of $total)")
      assert(zRows < rRows / 2,
        s"z-order should scan <half of random layout: z=$zRows random=$rRows")
    }
  }

  test("compact bin-packs small files, keeps content identical, and is idempotent") {
    val base = Files.createTempDirectory("graft-compact").toString
    val dir = s"$base/events_tbl"
    val df = Sources.table(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
    // fragment: ~8 small files inside every partition directory
    df.repartition(8).write.partitionBy("o_orderstatus").parquet(dir)

    def listing(): Map[String, Seq[(String, Long, Long)]] = {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).filter(_.isDirectory).map { d =>
        d.getPath.getName -> fs.listStatus(d.getPath)
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
          .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
          .toSeq.sortBy(_._1)
      }.toMap
    }
    val expect = df.orderBy($"o_orderkey").collect().toSeq
    val fragmented = listing()
    assert(fragmented.values.forall(_.size > 1), "fixture must be fragmented")

    val stats = Layout.compact(spark, dir, "o_orderstatus")
    val packed = listing()
    assert(stats.partitionsCompacted == fragmented.size)
    assert(stats.filesAfter < stats.filesBefore)
    assert(packed.values.forall(_.size == 1),
      s"every partition should pack to one file: ${packed.view.mapValues(_.size).toMap}")
    assert(spark.read.parquet(dir)
      .select($"o_orderkey", $"o_totalprice", $"o_orderstatus".cast("string"))
      .orderBy($"o_orderkey").collect().toSeq == expect,
      "compaction must be answer-invariant")

    // second pass: nothing to do, and no file is touched (byte-identity)
    val stats2 = Layout.compact(spark, dir, "o_orderstatus")
    assert(stats2.partitionsCompacted == 0)
    assert(listing() == packed, "idempotent rerun must not rewrite any file")
  }

  test("compact unescapes Hive-escaped partition values and skips the null sentinel") {
    // Partition values holding characters the dynamic writer Hive-escapes
    // in directory names (':' → %3A, '%' → %25, '=' → %3D) must still be
    // matched by compact's partition-pruned rewrite — before the
    // unescaping fix these silently stayed fragmented while the stats
    // claimed them compacted. The null partition sentinel
    // (__HIVE_DEFAULT_PARTITION__) has no string value to match and is
    // skipped explicitly.
    val base = Files.createTempDirectory("graft-compact-esc").toString
    val dir = s"$base/esc_tbl"
    val df = Seq.tabulate(80) { i =>
      (i.toLong, Seq(Some("a:b"), Some("c%d"), Some("e=f"), Option.empty[String])(i % 4))
    }.toDF("id", "p")
    df.repartition(4).write.partitionBy("p").parquet(dir)

    def fileCounts(): Map[String, Int] = {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).filter(_.isDirectory).map { d =>
        d.getPath.getName -> fs.listStatus(d.getPath)
          .count(st => st.isFile && !st.getPath.getName.startsWith("_"))
      }.toMap
    }
    val frag = fileCounts()
    assert(frag.keySet == Set("p=a%3Ab", "p=c%25d", "p=e%3Df",
      "p=__HIVE_DEFAULT_PARTITION__"), s"fixture dirs: ${frag.keySet}")
    assert(frag.values.forall(_ > 1), s"fixture must be fragmented: $frag")

    val stats = Layout.compact(spark, dir, "p")
    val packed = fileCounts()
    // the three escaped-value partitions really compacted...
    assert(stats.partitionsCompacted == 3, s"stats: $stats, files: $packed")
    assert(Seq("p=a%3Ab", "p=c%25d", "p=e%3Df").forall(packed(_) == 1), s"$packed")
    // ...the null sentinel is skipped, not crashed on
    assert(packed("p=__HIVE_DEFAULT_PARTITION__") ==
      frag("p=__HIVE_DEFAULT_PARTITION__"))
    // answer-invariant, including the null partition
    assert(spark.read.parquet(dir).select($"id", $"p".cast("string"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      (0 until 80).map(i =>
        i.toLong -> Seq("a:b", "c%d", "e=f", null)(i % 4)).toMap)
  }

  test("vacuum drops expired partitions, keeps survivors byte-identical, handles escapes and null") {
    val base = Files.createTempDirectory("graft-vacuum").toString
    val dir = s"$base/tbl"
    val df = Seq.tabulate(80) { i =>
      (i.toLong, Seq(Some("2024-01-01"), Some("2024-02-01"), Some("a:b"),
        Option.empty[String])(i % 4))
    }.toDF("id", "p")
    df.coalesce(1).write.partitionBy("p").parquet(dir) // one file per partition

    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def survivorFiles(): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"$dir/p=2024-02-01")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val before = survivorFiles()

    // expire everything before Feb, the escaped value, and the null
    // partition — the predicate sees UNESCAPED values and None
    val seen = scala.collection.mutable.Set[Option[String]]()
    def retained(v: Option[String]): Boolean =
      v.exists(s => s.startsWith("2024") && s >= "2024-02-01")
    val stats = Layout.vacuum(spark, dir, "p", { v =>
      seen += v
      retained(v)
    })
    assert(seen == Set(Some("2024-01-01"), Some("2024-02-01"), Some("a:b"), None))
    assert(stats == Layout.VacuumStats(partitionsDropped = 3,
      partitionsKept = 1, filesDropped = 3))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/p=2024-01-01")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/p=a%3Ab")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/p=__HIVE_DEFAULT_PARTITION__")))
    // survivors untouched byte-for-byte, table reads back as the remainder
    assert(survivorFiles() == before)
    assert(spark.read.parquet(dir).select($"id").collect().map(_.getLong(0)).toSet ==
      (0 until 80).filter(_ % 4 == 1).map(_.toLong).toSet)
    // idempotent rerun: nothing left to drop
    val again = Layout.vacuum(spark, dir, "p", retained)
    assert(again == Layout.VacuumStats(0, 1, 0))
  }

  test("joins and aggregations on the bucket key plan with zero exchanges") {
    val sfTag = "sf0001"
    val li = Layout.bucketedTable(spark,
      Sources.table(spark, sf001, "lineitem")
        .select($"l_orderkey", $"l_extendedprice"),
      s"li_bkt_$sfTag", "l_orderkey", 8)
    val ord = Layout.bucketedTable(spark,
      Sources.table(spark, sf001, "orders")
        .select($"o_orderkey", $"o_orderstatus"),
      s"ord_bkt_$sfTag", "o_orderkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey")
        .agg(sum($"l_extendedprice").as("rev"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed join/agg must be exchange-free, found ${shuffles.size}:\n$plan")
      assert(plan.toString.contains("SortMergeJoin"),
        s"expected a co-located sort-merge join:\n$plan")
      // and the answer is the same as the unbucketed plan's
      val expect = Sources.table(spark, sf001, "lineitem")
        .join(Sources.table(spark, sf001, "orders"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey").agg(sum($"l_extendedprice").as("rev"))
      assert(joined.orderBy($"l_orderkey").collect().toSeq ==
        expect.orderBy($"l_orderkey").collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
