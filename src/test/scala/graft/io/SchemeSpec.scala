package graft.io

import java.net.URI
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** A distinct-scheme Hadoop FileSystem backed by the local disk: proof
  * that swapping `file://` for `s3a://` (or any object store) is a
  * CONFIG-ONLY change. Registered via `fs.graftfs.impl` — exactly how
  * s3a is wired (`fs.s3a.impl`) — so every engine path that resolves a
  * FileSystem from the path's scheme just works, and any code that
  * string-matched on a scheme or assumed `file:` semantics would break
  * loudly here. */
class GraftTestFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}

class SchemeSpec extends SparkSpec {
  import spark.implicits._

  // config-only wiring, the fs.s3a.impl analog
  spark.sparkContext.hadoopConfiguration
    .set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)

  private def newDir(tag: String): String =
    "graftfs://" + Files.createTempDirectory(s"graft-scheme-$tag").toString

  test("no main-source code path string-matches a filesystem scheme") {
    // the engine resolves FileSystems from paths; a hardcoded scheme
    // literal would silently break the s3a swap
    val srcRoot = java.nio.file.Paths.get("src/main/scala")
    assert(Files.isDirectory(srcRoot))
    val offenders = Files.walk(srcRoot).iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    offenders.forEachRemaining { p =>
      if (p.toString.endsWith(".scala")) {
        // CODE lines only — Scaladoc may legitimately mention schemes
        val code = new String(Files.readAllBytes(p), "UTF-8")
          .linesIterator.map(_.trim)
          .filterNot(l => l.startsWith("*") || l.startsWith("//") ||
            l.startsWith("/*"))
        if (code.exists(l => l.contains("file://") || l.contains("s3a://") ||
            l.contains("s3://")))
          bad += p.toString
      }
    }
    assert(bad.isEmpty, s"scheme literals in main source: ${bad.mkString(", ")}")
  }

  test("csv sink + source round-trip over a non-file scheme") {
    val dir = newDir("csv")
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Sinks.csv(df, s"$dir/out")
    val back = Sources.csvInferred(spark, s"$dir/out")
      .select(col("k").cast("long"), col("v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("mergeInto upserts through a non-file scheme, partition pruning and all") {
    val dir = newDir("merge") + "/tbl"
    val base = Seq((1L, 10.0, "A"), (2L, 20.0, "B")).toDF("k", "v", "p")
    val upd = Seq((2L, 25.0, "B"), (3L, 30.0, "A")).toDF("k", "v", "p")
    graft.ops.Merge.mergeInto(spark, dir, base, Seq("k"), "p")
    graft.ops.Merge.mergeInto(spark, dir, upd, Seq("k"), "p")
    val got = spark.read.parquet(dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 10.0, 2L -> 25.0, 3L -> 30.0))
  }

  test("manifest table lifecycle commits through a non-file scheme") {
    val dir = newDir("manifest") + "/tbl"
    val base = spark.range(1, 51)
      .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" % 3).as("p"))
    graft.ops.Manifest.create(spark, dir, base, "p", statsCols = Seq("v"))
    graft.ops.Manifest.upsert(spark, dir,
      Seq((1L, 99.0, 1L)).toDF("k", "v", "p"), Seq("k"), "p")
    graft.ops.Manifest.delete(spark, dir,
      Seq((2L, 2L)).toDF("k", "p"), Seq("k"), "p")
    assert(graft.ops.Manifest.versions(spark, dir) == Seq(1L, 2L, 3L))
    val got = graft.ops.Manifest.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 49 && got(1L) == 99.0 && !got.contains(2L))
    // range pruning works on the foreign scheme too
    val hi = graft.ops.Manifest.readRange(spark, dir, "v", Some("99.0"), None)
      .collect().map(_.getLong(0)).toSet
    assert(hi == Set(1L))
  }

  test("streaming corpus ingest checkpoints + sinks over a non-file scheme") {
    implicit val sqlCtx = spark.sqlContext
    val work = newDir("stream")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.pipeline.Streaming.corpusIngest(
      mem.toDF().toDF("doc_id", "text"), work)
    mem.addData((1L, "the quick brown fox jumps over the lazy dog"))
    q.processAllAvailable()
    mem.addData((2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "something entirely different and unrelated here"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.read.parquet(s"$work/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L), "cross-batch dedup must hold on the foreign scheme")
  }
}
