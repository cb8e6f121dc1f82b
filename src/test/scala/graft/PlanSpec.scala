package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Physical-plan shape guards: these assert the SCALE properties the
  * engine is designed around — filters/projections reaching the parquet
  * scan, dimension joins broadcasting, exchange counts staying minimal.
  * A regression here is a 100-TB performance bug even when row-level
  * results stay correct. */
class PlanSpec extends SparkSpec {

  private def executedPlan(df: DataFrame): SparkPlan = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }
  private def planString(df: DataFrame): String = executedPlan(df).toString

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf001)

  test("src_scan: predicate and projection push into the parquet scan") {
    val s = planString(q("src_scan"))
    assert(s.contains("PushedFilters: [IsNotNull(l_extendedprice), GreaterThan(l_extendedprice,1000.0)]"),
      s"missing pushed filter in:\n$s")
    assert(s.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double>"),
      s"scan reads more than the 3 needed columns:\n$s")
  }

  test("join_lookup_cat: dimension join is broadcast, not shuffled") {
    val s = planString(q("join_lookup_cat"))
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$s")
    assert(!s.contains("SortMergeJoin"), s"dim lookup must not sort-merge:\n$s")
  }

  test("join_dim_chain: ONE fact-fact join, every dimension hop broadcast") {
    val s = planString(q("join_dim_chain"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(s).length
    assert(broadcasts >= 4,
      s"all four dim hops (customer/supplier/nation/region) must " +
        s"broadcast, got $broadcasts in:\n$s")
    val shuffled = "SortMergeJoin".r.findAllIn(s).length +
      "ShuffledHashJoin".r.findAllIn(s).length
    assert(shuffled <= 1,
      s"only lineitem⋈orders may shuffle, got $shuffled shuffle joins in:\n$s")
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"), s"no loop joins:\n$s")
  }

  test("agg_order_kpi: partial aggregation before the shuffle") {
    val s = planString(q("agg_order_kpi"))
    assert(s.contains("HashAggregate"), s)
    // partial_ functions indicate map-side combine is in place
    assert(s.contains("partial_"), s"no partial aggregation found:\n$s")
  }

  test("join_semi_ri plans as a semi join (never materializes the id set)") {
    val s = planString(q("join_semi_ri"))
    assert(s.contains("LeftSemi"), s"expected LeftSemi join in:\n$s")
  }

  test("q_validate_all: scan-level filters + single semi join, no extra exchanges") {
    val plan = executedPlan(q("q_validate_all"))
    val s = plan.toString
    assert(s.contains("PushedFilters"), s)
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    // one exchange for the final global sort at most (semi join broadcasts)
    assert(shuffles.size <= 1, s"too many shuffles (${shuffles.size}):\n$s")
  }

  test("whole-stage codegen covers the KPI aggregation pipeline") {
    // codegen'd spans appear as "*(n) Operator" in the executed plan tree
    val s = planString(q("agg_order_kpi"))
    assert(s.contains("*("), s"no whole-stage-codegen span found in:\n$s")
  }

  test("join_range: bucketed interval join stays an equi-join (no nested loop)") {
    val s = planString(q("join_range"))
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$s")
  }

  test("smp_hash: sampling predicate evaluates inside a codegen'd scan stage") {
    val s = planString(q("smp_hash"))
    // no shuffle before the filter: the decision is a scalar predicate
    // on the scan, not an aggregation or join
    assert(s.contains("*("), s"sampling filter fell out of codegen:\n$s")
    assert(!s.contains("SortMergeJoin") && !s.contains("HashAggregate"),
      s"sampling must be a pure scan+filter plan:\n$s")
  }

  test("evt_funnel: three conditional-min windows share one exchange") {
    val plan = executedPlan(q("evt_funnel"))
    // the three stacked window passes all partition by user_id — the
    // planner must reuse a single hash exchange for them (plus the
    // stage-count aggregation's own exchange and the final sort)
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 3,
      s"windows did not share the user_id exchange (${shuffles.size} shuffles):\n$plan")
  }

  test("anchored-IVF assignment: one projection over the scan, zero exchanges") {
    // round-4 verdict item: nearest-anchor assignment must NOT shuffle
    // the corpus (the old crossJoin + Window argmax moved corpus×nlist
    // rows on a near-unique key). With inlined anchors it is a single
    // Project over the parquet scan.
    val emb = graft.io.Sources.table(spark, sf001, "embeddings")
    val anchors = graft.ops.Similarity.anchoredAnchors(emb, "vec_id", "embedding", 16)
    val assigned = graft.ops.Similarity.anchoredAssign(emb, "vec_id", "embedding", anchors)
    val plan = executedPlan(assigned)
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"anchor assignment must not shuffle the corpus (${shuffles.size} exchanges):\n$plan")
    val s = plan.toString
    assert(!s.contains("Window") && !s.contains("Join"),
      s"assignment should be a pure projection:\n$s")
  }

  test("pq encode: corpus coding is one codegen'd projection, zero exchanges") {
    // the PQ index build must scan-and-project only — a shuffle or a
    // join in the encode pass would move raw embeddings at lake scale
    val emb = graft.io.Sources.table(spark, sf001, "embeddings")
    val anchors = graft.ops.Similarity.anchoredAnchors(emb, "vec_id", "embedding", 16)
    val flat = new Array[Long](8 * 16 * 8)
    for {
      s <- 0 until 8
      (a, c) <- anchors.sortBy(_._1).zipWithIndex
      i <- 0 until 8
    } flat((s * 16 + c) * 8 + i) = math.floor(a._2(s * 8 + i) * 1000).toLong
    val encoded = emb.select(org.apache.spark.sql.functions.col("vec_id"),
      graft.functions.GraftExpressions
        .pq_encode(org.apache.spark.sql.functions.col("embedding"), flat, 8, 16, 8, 1000)
        .as("codes"))
    val plan = executedPlan(encoded)
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, s"pq encode must not shuffle:\n$plan")
    val s = plan.toString
    assert(!s.contains("Join") && !s.contains("Window"),
      s"pq encode should be a pure projection:\n$s")
    assert(s.contains("*("), s"pq encode fell out of whole-stage codegen:\n$s")
  }

  test("txt_line_dedup: document text never rides a shuffle") {
    // the design claim of TextAnalysis.lineDedup: every exchange moves
    // fingerprints or int index lists — never text or segment strings
    // recurse into AQE query stages: materialized exchanges hide behind
    // QueryStageExec leaves, which a plain collect never descends into
    def allShuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = p match {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allShuffles(s.plan)
      case e: ShuffleExchangeExec => e +: e.children.flatMap(allShuffles)
      case other => other.children.flatMap(allShuffles)
    }
    // assert on the operator itself (the declared query appends a total-
    // order presentation sort, which range-shuffles the RESULT rows —
    // inherent to ordered output, not part of the dedup computation)
    val docs = graft.io.Sources.table(spark, sf001, "documents")
    val plan = executedPlan(graft.ops.TextAnalysis.lineDedup(docs))
    val shuffles = allShuffles(plan)
    assert(shuffles.nonEmpty, s"expected the frequency/regroup exchanges:\n$plan")
    val offenders = shuffles.filter(_.output.exists(a =>
      a.name == "text" || a.name == "seg" || a.name == "text_clean"))
    assert(offenders.isEmpty,
      s"text crossed a shuffle:\n${offenders.map(_.output.map(_.name)).mkString("; ")}\n$plan")
  }

  test("idx_postings: window, df count, and collect_list share ONE token exchange") {
    val docs = graft.io.Sources.table(spark, sf001, "documents")
    val plan = executedPlan(
      graft.ops.Index.postings(docs, minDf = 2L, maxDfFrac = 0.8, maxPostings = 50))
    def allShuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = p match {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allShuffles(s.plan)
      case e: ShuffleExchangeExec => e +: e.children.flatMap(allShuffles)
      case other => other.children.flatMap(allShuffles)
    }
    val shuffles = allShuffles(plan)
    // exactly ONE token-keyed exchange: df window, posting rank, and
    // collect_list all reuse it (the others are termFreq's fan-out on
    // doc_id and the one-row n_docs count)
    val tokenKeyed = shuffles.filter(
      _.outputPartitioning.toString.contains("token"))
    assert(tokenKeyed.size == 1, s"window/df/collect must share one token " +
      s"exchange (got ${tokenKeyed.size} of ${shuffles.size}):\n$plan")
    // text may ride ONLY fanOut's small-file repartition (REPARTITION_BY_NUM,
    // a no-op at lake scale where the scan has natural parallelism); it must
    // never cross a computed ENSURE_REQUIREMENTS exchange
    val textCrossed = shuffles.filter(e =>
      e.output.exists(_.name == "text") &&
        !e.toString.contains("REPARTITION_BY_NUM"))
    assert(textCrossed.isEmpty, s"document bodies crossed a shuffle:\n$plan")
    // the maxPostings cap reaches the sort as a group limit — the
    // "bound before aggregation" contract
    assert(plan.toString.contains("WindowGroupLimit"),
      s"posting cap must push down as a window group limit:\n$plan")
  }

  test("temperatureMixture: membership is a broadcast-fed scan predicate — corpus never shuffles") {
    val docs = graft.io.Sources.table(spark, sf001, "documents")
    val plan = executedPlan(
      graft.ops.Sampling.temperatureMixture(docs, "doc_id", "lang", 0.5))
    def allShuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = p match {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allShuffles(s.plan)
      case e: ShuffleExchangeExec => e +: e.children.flatMap(allShuffles)
      case other => other.children.flatMap(allShuffles)
    }
    // the only shuffles allowed are the domain-count aggregate's (tiny:
    // domain cardinality); the corpus side must join by broadcast, so no
    // exchange may carry text
    assert(plan.toString.contains("BroadcastHashJoin"),
      s"quota frame must broadcast:\n$plan")
    val textCrossed = allShuffles(plan).filter(_.output.exists(_.name == "text"))
    assert(textCrossed.isEmpty, s"corpus rows crossed a shuffle:\n$plan")
  }

  test("capPerDomain: rank cap plans as a WindowGroupLimit") {
    val docs = graft.io.Sources.table(spark, sf001, "documents")
    val plan = executedPlan(
      graft.ops.Sampling.capPerDomain(docs, "doc_id", "lang", 10))
    assert(plan.toString.contains("WindowGroupLimit"),
      s"per-domain cap must push down as a group limit:\n$plan")
  }

  test("join_asof_native: small right side broadcasts — fact side never shuffles") {
    val df = q("join_asof_native")
    df.collect()
    val s = planString(df)
    // sf0.001 orders fit the broadcast threshold, so the strategy must
    // pick the broadcast exec: no hash exchange on EITHER side (the only
    // exchange left is the final ORDER BY's range partitioning)
    assert(s.contains("BroadcastAsOfJoin"), s"expected broadcast as-of in:\n$s")
    assert(!s.contains("hashpartitioning"),
      s"broadcast as-of must not hash-shuffle either side:\n$s")
  }

  test("dedup_fuzzy: candidate generation is blocked — no all-pairs join shape anywhere") {
    val s = planString(q("dedup_fuzzy"))
    assert(!s.contains("CartesianProduct"),
      s"fuzzy join must never go quadratic:\n$s")
    assert(!s.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must never nested-loop:\n$s")
  }

  test("txt_perplexity_bigram: vocab + context lookups broadcast; text never shuffles") {
    def allShuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = p match {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allShuffles(s.plan)
      case e: ShuffleExchangeExec => e +: e.children.flatMap(allShuffles)
      case other => other.children.flatMap(allShuffles)
    }
    val docs = graft.io.Sources.table(spark, sf001, "documents")
    val plan = executedPlan(graft.ops.CorpusStats.bigramSurprisal(docs))
    val s = plan.toString
    assert("BroadcastHashJoin".r.findAllMatchIn(s).size >= 2,
      s"pair vocab and context table must both broadcast:\n$s")
    // exclude fanOut's explicit REPARTITION_BY_NUM: it fires only when
    // the scan is under-split (this 1-row-group fixture), is a no-op at
    // lake scale, and is the one exchange ALLOWED to carry text; the
    // computation's own exchanges (ENSURE_REQUIREMENTS) must not
    val offenders = allShuffles(plan).filter(e =>
      e.shuffleOrigin != org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM &&
        e.output.exists(_.name == "text"))
    assert(offenders.isEmpty, s"document text crossed a computation shuffle:\n$s")
  }
}
