package graft.ops

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Sources.table(spark, sf001, "documents")

  /** Scala reference fold of the next-fit discipline. */
  private def nextFitRef(toks: Seq[Int], budget: Long): Seq[Long] = {
    var pack = 0L; var fill = budget + 1
    toks.map { t =>
      if (fill + t > budget) { pack += 1; fill = t } else fill += t
      pack
    }
  }

  test("packAssignments matches the sequential next-fit fold per shard") {
    val got = Packing.packAssignments(docs, "doc_id", "text", 512L, 8)
      .select("doc_id", "n_tok", "shard", "pack_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.length == docs.count())
    got.groupBy(_._3).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._1)
      val want = nextFitRef(ordered.map(_._2).toSeq, 512L)
      assert(ordered.map(_._4).toSeq == want)
    }
  }

  test("budget is never exceeded except by single-document oversize packs") {
    val budget = 128L
    val a = Packing.packAssignments(docs, "doc_id", "text", budget, 4)
    val stats = Packing.packStats(a, budget)
      .select("shard", "pack_id", "n_docs", "pack_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val over = stats.filter(_._4 > budget)
    assert(over.forall(_._3 == 1L),
      s"multi-doc pack over budget: ${over.filter(_._3 > 1).take(3).toSeq}")
    // pack ids are 1-based and contiguous per shard
    stats.groupBy(_._1).foreach { case (_, packs) =>
      val ids = packs.map(_._2).sorted
      assert(ids.head == 1L && ids.last == ids.length.toLong)
    }
  }

  test("oversize flag marks exactly the docs whose own count exceeds budget") {
    val tiny = Seq((1L, "one two three"), (2L, ("w " * 40).trim), (3L, "x"))
      .toDF("doc_id", "text")
    val a = Packing.packAssignments(tiny, "doc_id", "text", 5L, 1)
      .select("doc_id", "n_tok", "pack_id", "oversize")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(a.map(_._4).toSeq == Seq(false, true, false))
    // the oversize doc sits alone; neighbors land in their own packs
    assert(a.map(_._2).distinct.length == a.count(x => true) ||
      a.filter(_._4).map(_._3).forall(p => a.count(_._3 == p) == 1))
  }

  test("next-fit-decreasing: same docs, valid packs, fill at least as good here") {
    val budget = 512L
    val plain = Packing.packAssignments(docs, "doc_id", "text", budget, 8)
    val nfd = Packing.packAssignments(docs, "doc_id", "text", budget, 8,
      decreasing = true)
    assert(nfd.count() == plain.count())
    // NFD order is (n_tok desc, doc_id) per shard — replay the fold
    val got = nfd.select("doc_id", "n_tok", "shard", "pack_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    got.groupBy(_._3).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (-r._2, r._1))
      assert(ordered.map(_._4).toSeq == nextFitRef(ordered.map(_._2).toSeq, budget))
    }
    // not a theorem on every dataset, but on this corpus NFD should not
    // need more packs than arrival order
    def nPacks(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("shard").agg(max("pack_id")).collect()
        .map(_.getLong(1)).sum
    assert(nPacks(nfd) <= nPacks(plain))
  }

  test("chunkByBudget: exact cover, budget-sized except the last, no shuffle") {
    val ch = Packing.chunkByBudget(docs, "doc_id", "text", 32)
    val rows = ch.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    rows.groupBy(_._1).foreach { case (id, chunks) =>
      val ordered = chunks.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == ordered.indices.map(identity).toSeq)
      assert(ordered.map(_._3).init.forall(_ == 32), s"doc $id non-full interior chunk")
      assert(ordered.last._3 > 0 && ordered.last._3 <= 32)
      assert(ordered.head._4 == ordered.length)
    }
    // token counts reassemble exactly
    val total = rows.map(_._3.toLong).sum
    val want = docs.select(sum(TextAnalysis.tokenCount(col("text"))))
      .collect().head.getLong(0)
    assert(total == want)
    ch.collect()
    val plan = ch.queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"), "chunking must not shuffle")
  }

  test("null and empty text read as countable tokens, never crash") {
    val tiny = Seq((1L, null: String), (2L, ""), (3L, "a b c"))
      .toDF("doc_id", "text")
    val a = Packing.packAssignments(tiny, "doc_id", "text", 10L, 1)
      .select("doc_id", "pack_id").collect()
    assert(a.length == 3)
  }

  test("chunkSliding: coverage, overlap, shrinking tail, empty-doc chunk") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")), // 20 tokens
      (2L, "a b c"), // under one window
      (3L, "") // token-free
    ).toDF("doc_id", "text")
    val out = Packing.chunkSliding(d, "doc_id", "text", size = 8, stride = 4)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Long, String)].collect()
    val doc1 = out.filter(_._1 == 1L)
    // 20 tokens, size 8, stride 4 → windows at 0,4,8,12: ceil((20-8)/4)+1 = 4
    assert(doc1.length == 4)
    assert(doc1.map(_._3).toSeq == Seq(8L, 8L, 8L, 8L))
    assert(doc1(0)._4.startsWith("t1 t2") && doc1(1)._4.startsWith("t5 t6"),
      "windows advance by stride")
    // every token appears in at least one window; adjacent windows share size-stride tokens
    val covered = doc1.flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 20).map(i => s"t$i").toSet)
    assert(doc1(0)._4.split(" ").toSet.intersect(doc1(1)._4.split(" ").toSet).size == 4)
    val doc2 = out.filter(_._1 == 2L)
    assert(doc2.length == 1 && doc2.head._3 == 3L && doc2.head._4 == "a b c")
    val doc3 = out.filter(_._1 == 3L)
    assert(doc3.length == 1 && doc3.head._3 == 0L && doc3.head._4 == "",
      "token-free doc yields one explicit empty chunk")
  }

  test("chunkSliding: shrinking tail when length is not a stride multiple") {
    import spark.implicits._
    val d = Seq((1L, (1 to 13).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = Packing.chunkSliding(d, "doc_id", "text", size = 8, stride = 4)
      .orderBy("chunk_idx").as[(Long, Int, Long, String)].collect()
    // 13 tokens → windows at 0,4,8: ceil((13-8)/4)+1 = 3; tails 8,8,5
    assert(out.map(_._3).toSeq == Seq(8L, 8L, 5L))
    assert(out.last._4 == "t9 t10 t11 t12 t13")
  }

  test("one exchange: documents shuffle once on shard, bodies stay in the scan") {
    val a = Packing.packAssignments(docs, "doc_id", "text", 512L, 8)
    a.collect()
    val plan = a.queryExecution.executedPlan match {
      case aqe: AdaptiveSparkPlanExec => aqe.executedPlan
      case p => p
    }
    // recurse into AQE query stages: materialized exchanges hide behind
    // QueryStageExec leaves, which a plain collect never descends into
    def allShuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] = p match {
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allShuffles(s.plan)
      case e: ShuffleExchangeExec => e +: e.children.flatMap(allShuffles)
      case other => other.children.flatMap(allShuffles)
    }
    val exchanges = allShuffles(plan)
    assert(exchanges.length == 1, s"expected 1 shuffle, got ${exchanges.length}")
    // the shuffled row carries no text column — token count is computed
    // in the scan-side projection before the exchange
    val shuffled = exchanges.head.child.output.map(_.name)
    assert(!shuffled.contains("text"), s"text rides the shuffle: $shuffled")
  }
}
