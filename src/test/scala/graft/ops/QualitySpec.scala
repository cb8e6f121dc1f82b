package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Quality.Check._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1L), Some(10.0), Some("A")),
    (Some(2L), Some(-5.0), Some("B")),
    (Some(2L), None, Some("A")),
    (None, Some(3.0), Some("Z")),
    (Some(4L), Some(100.0), None)
  ).toDF("k", "v", "flag")

  private def byCheck(checks: Seq[Quality.Check]) =
    Quality.report(df, checks).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))).toMap

  test("each check kind counts exactly what it claims") {
    val m = byCheck(Seq(
      Complete("k"),
      Complete("v"),
      InRange("v", 0, 50),
      InSet("flag", Seq("A", "B")),
      Satisfies("v_pos", col("v") > 0),
      Unique("k")))
    assert(m("complete(k)") == ((4L, 5L, 0.8, 1.0, false)))
    assert(m("complete(v)") == ((4L, 5L, 0.8, 1.0, false)))
    // nulls fail range; -5 and 100 out of range -> only 10.0 and 3.0
    assert(m("in_range(v,0.0,50.0)")._1 == 2L)
    // null flag fails membership; Z not in set
    assert(m("in_set(flag)")._1 == 3L)
    // null predicate is a fail, not a null row
    assert(m("satisfies(v_pos)") == ((3L, 5L, 0.6, 1.0, false)))
    // distinct {1,2,4} over 4 non-null rows
    assert(m("unique(k)") == ((3L, 4L, 0.75, 1.0, false)))
  }

  test("rational thresholds decide exactly at the boundary") {
    // 4/5 complete: threshold 4/5 passes, 81/100 fails — the float
    // compare 0.8 >= 0.81 vs cross-multiplied 4*100 >= 81*5 agree here,
    // but 0.8 as a double is 0.8000000000000000444...; the rational
    // compare is immune to representation by construction
    val m = byCheck(Seq(
      Complete("k", 4, 5),
      Complete("v", 81, 100)))
    assert(m("complete(k)")._5)
    assert(!m("complete(v)")._5)
  }

  test("a clean keyed relation passes a full suite; empty input passes vacuously") {
    val clean = Seq((1L, 5.0, "A"), (2L, 7.0, "B")).toDF("k", "v", "flag")
    val rep = Quality.report(clean, Seq(
      Complete("k"), Unique("k"), InRange("v", 0, 10),
      InSet("flag", Seq("A", "B")), Satisfies("v_pos", col("v") > 0)))
    assert(rep.collect().forall(_.getBoolean(5)))
    val empty = clean.filter(col("k") < 0)
    val rep0 = Quality.report(empty, Seq(Complete("k"), Unique("k")))
    rep0.collect().foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getBoolean(5))
    }
  }

  test("the report is ONE aggregation pass over the input (plus the stack projection)") {
    val rep = Quality.report(df, Seq(Complete("k"), InRange("v", 0, 50),
      Satisfies("v_pos", col("v") > 0)))
    val plan = rep.queryExecution.executedPlan.toString
    // predicate-only suites must not expand or join: exactly one
    // aggregate pair (partial + final) over one scan of the input
    assert(!plan.contains("Expand"), plan)
    assert(!plan.contains("Join"), plan)
    val scans = "LocalTableScan|Scan ".r.findAllIn(plan).length
    assert(scans == 1, s"expected one input scan, plan:\n$plan")
  }
}
