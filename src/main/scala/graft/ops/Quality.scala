package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/Great-
  * Expectations shape): a list of named checks evaluated over a table
  * in ONE aggregation pass, returning a small report relation —
  * `(check, n_pass, n_total, metric, threshold, passed)`.
  *
  * The reference validates by FILTERING (drop bad rows —
  * `/root/reference/Task_1/task_1.py`'s not-null/positive-price gates,
  * re-expressed in [[Validate]]); a lake-scale pipeline also needs the
  * MEASURING form — "what fraction of this 100 TB drop is broken, and
  * did it cross the gate threshold?" — evaluated without materializing
  * the bad rows.
  *
  * Scale design: every predicate check compiles to a conditional SUM in
  * a single `df.agg(...)` — one scan, partial aggregation map-side, a
  * 1-row exchange. [[Check.Unique]] adds an exact distinct (the only
  * shuffle-bearing metric; Spark plans the mixed aggregate via Expand),
  * which is the audit-grade contract — sample or sketch upstream if an
  * approximate uniqueness is enough. Metrics are exact-integer ratios
  * (`n_pass / n_total` as longs, divided once), so the report is
  * deterministic under any row order and partitioning — no
  * floating-point accumulation order to disagree with an oracle.
  *
  * `passed` compares the integer counts cross-multiplied against the
  * rational threshold (`n_pass * denom >= num * n_total`), dodging
  * double rounding at exact boundaries (e.g. threshold 0.95 on 19/20).
  */
object Quality {

  /** One declared constraint. `thresholdNum/thresholdDen` is the
    * minimum passing fraction as a rational (default 1 = every row). */
  sealed trait Check {
    def name: String
    def thresholdNum: Long
    def thresholdDen: Long
  }
  object Check {
    /** Fraction of rows with `col` non-null. */
    final case class Complete(col: String,
                              thresholdNum: Long = 1, thresholdDen: Long = 1)
        extends Check { val name = s"complete($col)" }

    /** Fraction of rows with `lo <= col <= hi` (nulls fail). */
    final case class InRange(col: String, lo: Double, hi: Double,
                             thresholdNum: Long = 1, thresholdDen: Long = 1)
        extends Check { val name = s"in_range($col,$lo,$hi)" }

    /** Fraction of rows whose `col` is one of `values` (nulls fail). */
    final case class InSet(col: String, values: Seq[String],
                           thresholdNum: Long = 1, thresholdDen: Long = 1)
        extends Check { val name = s"in_set($col)" }

    /** Fraction of rows satisfying an arbitrary boolean column
      * expression (null predicate = fail). */
    final case class Satisfies(label: String, predicate: Column,
                               thresholdNum: Long = 1, thresholdDen: Long = 1)
        extends Check { val name = s"satisfies($label)" }

    /** `count_distinct(col) / count(rows with col non-null)` — 1.0 iff
      * `col` is a key among its non-null rows (count_distinct skips
      * nulls; pair with [[Complete]] to also forbid them). */
    final case class Unique(col: String,
                            thresholdNum: Long = 1, thresholdDen: Long = 1)
        extends Check { val name = s"unique($col)" }
  }
  import Check._

  /** Evaluate `checks` over `df` in one aggregation pass. Output is one
    * row per check, ordered as declared is NOT guaranteed — sort on
    * `check` downstream if determinism of order matters. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val n = count(lit(1))
    // coalesce: sum over an EMPTY relation is null, counts are 0 — an
    // empty input must report (0, 0, vacuous pass), not nulls
    def hits(cond: Column): Column =
      coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L))
    val aggs: Seq[Column] = checks.zipWithIndex.flatMap { case (ch, i) =>
      val (pass, total) = ch match {
        case Complete(c, _, _) => (hits(col(c).isNotNull), n)
        case InRange(c, lo, hi, _, _) =>
          (hits(col(c).isNotNull && col(c) >= lo && col(c) <= hi), n)
        case InSet(c, vs, _, _) => (hits(col(c).isInCollection(vs)), n)
        case Satisfies(_, p, _, _) => (hits(coalesce(p, lit(false))), n)
        case Unique(c, _, _) =>
          (count_distinct(col(c)), hits(col(c).isNotNull))
      }
      Seq(pass.cast("long").as(s"_p$i"), total.cast("long").as(s"_t$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (ch, i) =>
      val p = col(s"_p$i"); val t = col(s"_t$i")
      struct(
        lit(ch.name).as("check"),
        p.as("n_pass"),
        t.as("n_total"),
        // null metric on an empty relation (ANSI mode: 0/0 is an error)
        when(t =!= 0, p.cast("double") / t.cast("double")).as("metric"),
        (lit(ch.thresholdNum).cast("double") / lit(ch.thresholdDen).cast("double"))
          .as("threshold"),
        // cross-multiplied rational compare: exact at boundaries,
        // and an empty relation (t = 0) vacuously passes
        (p * lit(ch.thresholdDen) >= lit(ch.thresholdNum) * t).as("passed"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
