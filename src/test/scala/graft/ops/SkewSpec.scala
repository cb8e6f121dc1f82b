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

  test("agg_order_kpi shape survives a 50%-hot order_date at sf0.1") {
    // Poisoned fixture: half of all orders collapse onto ONE order_date —
    // the 100-TB nightmare for a date-grained KPI (one group holds 50% of
    // 600 K joined rows). The shape must complete under the default
    // session (AQE on, partial aggregation) and produce exactly the same
    // numbers as the two-phase salted route, which is the explicit
    // fallback when a real deployment's hot day dwarfs its siblings.
    val sf01 = "/root/testdata/sf0.1"
    val hot = to_date(lit("1995-06-15"))
    val orders = graft.io.Sources.table(spark, sf01, "orders")
      .withColumn("o_orderdate",
        when(col("o_orderkey") % 2 === 0, hot).otherwise(to_date(col("o_orderdate"))))
    // exact decimal money (order-independent sums — the engine's own
    // money rule), so direct and salted results must match EXACTLY
    val joined = graft.io.Sources.table(spark, sf01, "lineitem")
      .join(orders, col("l_orderkey") === col("o_orderkey"), "inner")
      .withColumn("order_date", to_date(col("o_orderdate")))
      .select(col("order_date"),
        col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(12, 2))
          .as("l_extendedprice"))

    // direct shape (what agg_order_kpi runs): completes and is consistent
    val direct = joined.groupBy("order_date")
      .agg(sum(col("l_extendedprice")).as("sum_l_extendedprice"),
        count(lit(1)).as("n_rows"))
      .collect().map(r => r.getDate(0).toString ->
        (r.getDecimal(1).stripTrailingZeros, r.getLong(2))).toMap
    val totalRows = direct.values.map(_._2).sum
    val hotRow = direct("1995-06-15")
    assert(hotRow._2 >= (totalRows * 0.45).toLong,
      s"hot date should hold ~half the rows, got ${hotRow._2} of $totalRows")
    assert(direct.size > 1000, "non-hot dates must survive alongside the hot one")

    // salted two-phase route: identical sums (exact decimal) and counts
    val salted = Skew.saltedSumCount(joined, Seq("order_date"), "l_extendedprice")
      .collect().map(r => r.getDate(0).toString ->
        (r.getDecimal(1).stripTrailingZeros, r.getLong(2))).toMap
    assert(salted == direct)
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
