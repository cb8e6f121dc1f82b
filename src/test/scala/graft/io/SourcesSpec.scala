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
}
