package graft.io

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("fanOut: under-split scan spreads to cluster parallelism") {
    // single-row-group parquet = one scan task regardless of size
    val docs = Sources.table(spark, sf001, "documents")
    assert(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val fanned = Sources.fanOut(docs, "doc_id")
    assert(fanned.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // row set unchanged
    assert(fanned.count() == docs.count())
  }

  test("fanOut: no-op when the input already has enough partitions") {
    val wide = spark.range(1000).repartition(
      spark.sparkContext.defaultParallelism * 2).toDF("doc_id")
    val out = Sources.fanOut(wide, "doc_id")
    assert(out.rdd.getNumPartitions == wide.rdd.getNumPartitions)
  }

  test("csvWithRejects: malformed lines land in _corrupt_record, clean rows parse") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-rejects")
    val f = dir.resolve("data.csv")
    java.nio.file.Files.writeString(f,
      "id,price\n1,10.5\nnot-a-number-row,abc\n3,7.25\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("price", DoubleType)))
    // Spark disallows querying ONLY the corrupt column straight off the
    // raw file scan — materialize the parse first (what a real ingest
    // does anyway before splitting good/reject channels)
    val out = Sources.csvWithRejects(spark, f.toString, schema).cache()
    val good = out.filter(out("_corrupt_record").isNull)
    val bad = out.filter(out("_corrupt_record").isNotNull)
    assert(good.count() == 2 && bad.count() == 1)
    assert(bad.select("_corrupt_record").collect()
      .head.getString(0).startsWith("not-a-number-row"),
      "the raw offending line must be preserved for replay")
  }
}
