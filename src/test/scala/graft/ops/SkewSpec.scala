package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sinks

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hot key: 900 of 1000 rows share key 1
  private lazy val fact = (1 to 1000).map { i =>
    (if (i <= 900) 1L else (i % 7).toLong, i.toDouble)
  }.toDF("k", "v")
  private lazy val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
    (5L, "d"), (6L, "e"), (0L, "z")).toDF("k", "name")

  test("salted aggregation equals direct aggregation") {
    val direct = fact.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n_rows"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(fact, Seq("k"), "v")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("salted join is row-identical to the plain join") {
    val plain = fact.join(dim, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedJoin(fact, dim, "k").select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
  }

  test("salted results are deterministic across runs (content-derived salt)") {
    val a = Skew.saltedJoin(fact, dim, "k").count()
    val b = Skew.saltedJoin(fact, dim, "k").count()
    assert(a == b && a == 1000L - 100L + 100L) // keys 0..6 all present in dim
  }

  test("date-partitioned parquet prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    val df = Seq(("2024-01-01", 1.0), ("2024-01-01", 2.0), ("2024-01-02", 3.0))
      .toDF("day", "v")
    Sinks.parquetPartitioned(df, dir, "day")
    val read = spark.read.parquet(dir).filter(col("day") === "2024-01-01")
    assert(read.count() == 2)
    val plan = read.queryExecution.executedPlan.toString
    // the day predicate must land in PartitionFilters (directory pruning),
    // not in the row-level data filters
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)
    assert(plan.replaceAll("\\s+", " ")
      .matches(".*PartitionFilters: \\[isnotnull\\(day[^\\]]*= 2024-01-01\\)\\].*"), plan)
  }
}
