package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.schema.Schemas

/** Property-based invariants (SURVEY.md §5.2 item 3) over randomized
  * small frames: RI semi-join containment, union-all conservation,
  * validation idempotence, aggregation grain identities. */
class PropertySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  /** Deterministic sampling loop (the scalatest-scalacheck bridge is not
    * in the offline dependency cache): fixed seeds, so failures replay. */
  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }
  private def forSamples2[A, B](ga: Gen[A], gb: Gen[B], n: Int)(body: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      body(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default, Seed(1000L + i)))
    }

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 3600L * 1000L)

  private val orderGen = for {
    n <- Gen.choose(1, 15)
    ids <- Gen.pick(n, 1 to 50)
    rows <- Gen.sequence[Seq[Row], Row](ids.map { id =>
      for {
        user <- Gen.choose(1L, 5L)
        returned <- Gen.oneOf(true, false)
        nullKey <- Gen.frequency(9 -> false, 1 -> true)
      } yield Row(if (nullKey) null else id.toLong, user,
        if (returned) "returned" else "delivered", ts(id),
        if (returned) ts(id + 96) else null, ts(id + 24), ts(id + 48), 1L)
    })
  } yield rows

  // ---- TopKAgg: aggregator == sort-then-take, under any partitioning ----
  private val scoredGen = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.sequence[Seq[(Long, Double)], (Long, Double)]((1 to n).map { i =>
      // duplicate scores on purpose: ties must break by smaller id
      Gen.choose(0, 9).map(s => (i.toLong, s / 2.0))
    })
  } yield rows

  test("property: TopKAgg equals sort.take(k) for any input and partitioning") {
    import spark.implicits._
    forSamples(scoredGen, 30) { rows =>
      val k = 5
      val expected = rows.sortBy { case (id, s) => (-s, id) }.take(k)
        .map { case (id, s) => (s, id) }
      for (parts <- Seq(1, 3, 7)) {
        val df = spark.createDataset(rows).toDF("id", "score").repartition(parts)
        val got = df.agg(graft.functions.TopKAgg.top_k(k)($"id", $"score").as("t"))
          .select(explode($"t").as("e")).select($"e._1", $"e._2")
          .as[(Double, Long)].collect().toSeq
        assert(got == expected, s"parts=$parts rows=$rows")
      }
    }
  }

  test("approx_count_distinct: deterministic across runs, within its error bound") {
    // HLL++ has no RNG: same data -> same sketch -> same estimate, so the
    // rows-only agg_approx_distinct query is still repeatable; and the
    // estimate stays within the configured relative error of the truth.
    val orders = graft.io.Sources.table(spark, sf001, "orders")
    def run() = orders.agg(
      approx_count_distinct(col("o_custkey"), 0.05).as("a")).head.getLong(0)
    val (a, b) = (run(), run())
    assert(a == b, "HLL estimate must be deterministic")
    val exact = orders.agg(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(math.abs(a - exact).toDouble / exact < 0.15,
      s"estimate $a too far from exact $exact")
  }

  test("approx_count_distinct: per-group ≤2% relative error at sf0.1 across 3 cardinalities") {
    // The quantitative contract behind `agg_approx_distinct` (whose
    // oracle replays the exact half and pins the within-2% flag — this
    // spec holds the SAME 2% bound at heavy cardinalities the sf0.01
    // verify run never reaches). At sf0.1 (150k orders, ~100k distinct
    // custkeys) the sketch at rsd=0.008 (the query's configured
    // precision, 2% = 2.5σ) must stay within 2% of exact at EVERY group
    // in three grouping grains: global (1), order status (3), order
    // month (~80). Earlier measurements for context: default rsd=0.05
    // ran 5.1% global / 8.8% worst month; rsd=0.02 passed a 5% gate.
    // Deterministic: HLL++ has no RNG — fixed numbers, not a flaky
    // tolerance.
    val orders = graft.io.Sources.table(spark, "/root/testdata/sf0.1", "orders")
    def maxRelErr(groups: Seq[org.apache.spark.sql.Column]): Double = {
      val agg = if (groups.isEmpty) orders.groupBy() else orders.groupBy(groups: _*)
      agg.agg(approx_count_distinct(col("o_custkey"), 0.008).as("a"),
          countDistinct(col("o_custkey")).as("e"))
        .select(abs(col("a") - col("e")).cast("double") / col("e"))
        .collect().map(_.getDouble(0)).max
    }
    val global = maxRelErr(Nil)
    val byStatus = maxRelErr(Seq(col("o_orderstatus")))
    val byMonth = maxRelErr(Seq(date_trunc("month", to_date(col("o_orderdate")))))
    info(f"HLL rel-err at rsd=0.008: global $global%.4f, status $byStatus%.4f, month $byMonth%.4f")
    assert(global <= 0.02, s"global HLL error $global > 2%")
    assert(byStatus <= 0.02, s"per-status HLL error $byStatus > 2%")
    assert(byMonth <= 0.02, s"per-month HLL error $byMonth > 2%")
  }

  test("property: assignSplit partitions exactly and agrees with sampleByHash") {
    import spark.implicits._
    forSamples(Gen.listOfN(40, Gen.choose(0L, 100000L)), 20) { keys =>
      val df = keys.distinct.toDF("k")
      val splits = Sampling.assignSplit(df, "k",
        Seq("a" -> 0.3, "b" -> 0.3, "c" -> 0.4))
      // disjoint + exhaustive
      assert(splits.filter($"split".isNull).count() == 0)
      // the 'a' split IS the 30% hash sample (same cumulative cut)
      val aSet = splits.filter($"split" === "a").select("k").as[Long].collect().toSet
      val sample = Sampling.sampleByHash(df, "k", 0.3).select("k").as[Long].collect().toSet
      assert(aSet == sample)
    }
  }

  test("property: shuffledShards is a permutation — every key kept once, pos dense per shard") {
    import spark.implicits._
    forSamples(Gen.listOfN(60, Gen.choose(0L, 1000000L)), 15) { keys =>
      val ks = keys.distinct
      val out = graft.ops.Export.shuffledShards(ks.toDF("id"), "id", numShards = 4)
        .select($"id", $"shard", $"pos").as[(Long, Long, Long)].collect()
      assert(out.map(_._1).sorted.toSeq == ks.sorted, "no key lost or duplicated")
      out.groupBy(_._2).foreach { case (_, rows) =>
        val ps = rows.map(_._3).sorted.toSeq
        assert(ps == (1L to rows.length).toSeq, s"pos must be dense 1..n: $ps")
      }
      assert(out.forall(r => r._2 >= 0 && r._2 < 4))
    }
  }

  test("property: temperatureMixture per-domain keeps never exceed size; deterministic") {
    import spark.implicits._
    val gen = for {
      nBig <- Gen.choose(30, 300)
      nSmall <- Gen.choose(1, 30)
    } yield (nBig, nSmall)
    forSamples(gen, 10) { case (nBig, nSmall) =>
      val d = spark.range(0, nBig + nSmall)
        .select(col("id"), when(col("id") < nBig, "big").otherwise("small").as("dom"))
      val out = Sampling.temperatureMixture(d, "id", "dom", targetFrac = 0.5)
      val kept = out.groupBy("dom").count().as[(String, Long)].collect().toMap
      assert(kept.getOrElse("big", 0L) <= nBig)
      assert(kept.getOrElse("small", 0L) <= nSmall)
      // exact saturation invariant: when a domain's quota reaches its
      // size, the cross-multiplied cut admits EVERY bucket, so the whole
      // domain survives (realized counts elsewhere are hash-binomial
      // around the quota rate — bounded only by n_d, asserted above)
      val wBig = math.sqrt(nBig.toDouble).toLong
      val wSmall = math.sqrt(nSmall.toDouble).toLong
      val quotaSmall =
        ((nBig + nSmall) / 2).toLong * wSmall / (wBig + wSmall)
      if (quotaSmall >= nSmall)
        assert(kept.getOrElse("small", 0L) == nSmall.toLong,
          s"saturated quota $quotaSmall must keep all $nSmall")
      val again = Sampling.temperatureMixture(d, "id", "dom", 0.5)
        .select("id").as[Long].collect().sorted.toSeq
      assert(again == out.select("id").as[Long].collect().sorted.toSeq)
    }
  }

  test("property: capPerDomain keeps min(cap, n) per domain and is a subset") {
    import spark.implicits._
    forSamples2(Gen.choose(1, 12), Gen.listOfN(50, Gen.choose(0L, 500L)), 10) {
      (cap, keys) =>
        val d = keys.distinct.toDF("id")
          .withColumn("dom", (col("id") % 3).cast("string"))
        val out = Sampling.capPerDomain(d, "id", "dom", cap)
        val sizes = d.groupBy("dom").count().as[(String, Long)].collect().toMap
        val kept = out.groupBy("dom").count().as[(String, Long)].collect().toMap
        sizes.foreach { case (dom, n) =>
          assert(kept.getOrElse(dom, 0L) == math.min(n, cap.toLong),
            s"dom $dom: kept ${kept.getOrElse(dom, 0L)} of $n at cap $cap")
        }
        val ids = out.select("id").as[Long].collect().toSet
        assert(ids.subsetOf(keys.toSet))
    }
  }

  private val itemGen = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.sequence[Seq[Row], Row]((1 to n).map { i =>
      for {
        order <- Gen.choose(1L, 60L) // some orphans beyond order ids 1..50
        product <- Gen.choose(1000L, 1005L)
        price <- Gen.oneOf(-5.0, 0.0, 9.99, 25.5, 100.0)
        nullPrice <- Gen.frequency(9 -> false, 1 -> true)
      } yield Row(i.toLong, order, 1L, product, "delivered", ts(i), ts(i), ts(i),
        null, if (nullPrice) null else price)
    })
  } yield rows

  private def ordersDf(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, Schemas.orders)
  private def itemsDf(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, Schemas.orderItems)

  test("validation is idempotent and output is a subset of input") {
    forSamples2(orderGen, itemGen, 8) { (oRows, iRows) =>
      val orders = ordersDf(oRows)
      val items = itemsDf(iRows)
      val vOrders = Validate.validateOrders(orders)
      val vItems = Validate.validateItems(items, vOrders)
      // subset: every surviving item id existed in the input
      val inIds = iRows.map(_.getLong(0)).toSet
      val outIds = vItems.select("id").collect().map(_.getLong(0)).toSet
      assert(outIds.subsetOf(inIds))
      // idempotence: validating the validated layer changes nothing
      val again = Validate.validateItems(vItems, vOrders)
      assert(again.count() == vItems.count())
      // no orphans survive
      val orderIds = vOrders.select("order_id").collect().map(_.getLong(0)).toSet
      val survivors = vItems.select("order_id").collect().map(_.getLong(0)).toSet
      assert(survivors.subsetOf(orderIds))
    }
  }

  test("union-all conserves row counts; semi+anti partition the input") {
    forSamples(itemGen, 8) { iRows =>
      val items = itemsDf(iRows)
      val lo = items.filter(col("id") <= 20)
      val hi = items.filter(col("id") > 20)
      assert(lo.unionByName(hi).count() == items.count())

      val valid = itemsDf(iRows.take(iRows.length / 2)).select("order_id")
      val semi = Validate.semiJoinRI(valid, "order_id")(items)
      val anti = Validate.antiJoinOrphans(valid, "order_id")(items)
      assert(semi.count() + anti.count() == items.count())
    }
  }

  test("order-KPI grain identities: items counted once, revenue additive") {
    forSamples2(orderGen, itemGen, 6) { (oRows, iRows) =>
      val vOrders = Validate.validateOrders(ordersDf(oRows))
      val vItems = Validate.validateItems(itemsDf(iRows), vOrders)
      val products = spark.createDataFrame(
        Seq(Row(1000L, "s", 1.0, "C0", "n", "b", 2.0, "d"),
          Row(1001L, "s", 1.0, "C1", "n", "b", 2.0, "d"),
          Row(1002L, "s", 1.0, "C2", "n", "b", 2.0, "d")).asJava, Schemas.products)
      val merged = Transform.merged(vItems, vOrders, products)
      val (catKpi, orderKpi) = Transform.kpis(vItems, vOrders, products)
      val mergedCount = merged.count()
      val itemsSold = orderKpi.agg(sum("total_items_sold")).collect().head
      assert(Option(itemsSold.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L) == mergedCount)
      // category revenue (non-null categories) never exceeds total revenue
      val catRev = catKpi.agg(sum("daily_revenue")).collect().head
      val totRev = orderKpi.agg(sum("total_revenue")).collect().head
      val c = Option(catRev.get(0)).map(_.asInstanceOf[Double]).getOrElse(0.0)
      val t = Option(totRev.get(0)).map(_.asInstanceOf[Double]).getOrElse(0.0)
      assert(c <= t + 0.01 * (mergedCount + 1)) // rounding slack per group
    }
  }

  test("property: fuzzyPairs equals brute-force Levenshtein on random low-alphabet strings") {
    import spark.implicits._
    // a 3-letter alphabet maximizes shared grams (the hardest regime for
    // prefix blocking: ties, gram-poor strings, hot buckets all appear)
    val strGen = for {
      len <- Gen.choose(0, 8)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val corpusGen = Gen.choose(5, 25).flatMap(n => Gen.listOfN(n, strGen))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    forSamples(corpusGen, 12) { strs =>
      val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      for (maxDist <- Seq(1, 2)) {
        val got = Dedup.fuzzyPairs(df, "s", maxDist = maxDist)
          .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
        val u = strs.distinct
        val want = (for (a <- u; b <- u if a < b; e = lev(a, b)
                         if e >= 1 && e <= maxDist) yield (a, b, e)).toSet
        assert(got == want, s"maxDist=$maxDist corpus=$strs")
      }
    }
  }

  test("property: scd2Apply matches a reference fold over random update sequences") {
    import spark.implicits._
    import java.sql.Date
    // model: per key, the reference history as an ordered version list
    def refFold(hist: Map[Long, List[(Option[String], String, Option[String])]],
                batch: Seq[(Long, Option[String], String)]) =
      batch.foldLeft(hist) { case (h, (k, attr, eff)) =>
        val versions = h.getOrElse(k, Nil)
        versions.find(_._3.isEmpty) match {
          case None =>
            h.updated(k, versions :+ ((attr, eff, None)))
          case Some(cur @ (cAttr, cFrom, _)) =>
            if (cAttr == attr) h // no-op
            else if (eff <= cFrom) h // stale
            else h.updated(k, versions.filterNot(_ == cur) :+
              ((cAttr, cFrom, Some(eff))) :+ ((attr, eff, None)))
        }
      }
    val batchGen = for {
      n <- Gen.choose(1, 6)
      ks <- Gen.pick(n, 1L to 8L) // distinct keys per batch (the contract)
      rows <- Gen.sequence[Seq[(Long, Option[String], String)], (Long, Option[String], String)](
        ks.map { k =>
          for {
            attr <- Gen.option(Gen.oneOf("a", "b", "c"))
            day <- Gen.choose(1, 28)
          } yield (k, attr, f"2024-01-$day%02d")
        })
    } yield rows
    val seqGen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, batchGen))
    forSamples(seqGen, 10) { batches =>
      def asDf(b: Seq[(Long, Option[String], String)]) =
        b.toDF("k", "attr", "eff").select($"k", $"attr", $"eff".cast("date").as("eff"))
      val empty = Seq.empty[(Long, Option[String], String)]
        .toDF("k", "attr", "eff")
        .select($"k", $"attr", $"eff".cast("date").as("valid_from"))
        .withColumn("valid_to", lit(null).cast("date"))
      val sparkHist = batches.foldLeft(empty) { (h, b) =>
        Merge.scd2Apply(h, asDf(b), Seq("k"), Seq("attr"), "eff")
      }.collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString))).toSet
      val refHist = batches.foldLeft(
        Map.empty[Long, List[(Option[String], String, Option[String])]])(refFold)
        .flatMap { case (k, vs) => vs.map(v => (k, v._1, v._2, v._3)) }.toSet
      assert(sparkHist == refHist, s"batches=$batches")
    }
  }
}
