package graft.tools

import org.apache.spark.sql.functions._
import graft.{Spark, SparkEntry}
import graft.io.Sources
import graft.ops.Dedup
import graft.functions.GraftExpressions

/** One-off instrumentation of the dedup_minhash stages at a given SF. */
object MinhashDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Spark.session(appName = "graft-minhash-debug")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Sources.table(spark, sfDir, "documents")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val n = time("count docs")(docs.count())
    println(s"docs: $n")

    val sigs = docs.select(col("doc_id"),
      GraftExpressions.minhash_signature(
        Dedup.shingles(col("text"), 3), 64).as("sig"))
    time("signatures (noop write)") {
      sigs.write.format("noop").mode("overwrite").save()
    }

    val sigsP = sigs.persist()
    time("persist materialize")(sigsP.count())

    val banded = sigsP.select(col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(15)),
        b => struct(b.as("band"),
          xxhash64(slice(col("sig"), b * 4 + 1, lit(4))).as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket"))
    time("banded count")(println("banded rows: " + banded.count()))

    val bucketSizes = banded.groupBy("band", "bucket").count()
    time("bucket histogram") {
      bucketSizes.orderBy(col("count").desc).show(10)
      bucketSizes.selectExpr("sum(count*(count-1)/2) as candidate_pairs").show()
    }

    val a = banded.select(col("doc_id").as("id_a"), col("sig").as("sig_a"),
      col("band"), col("bucket"))
    val b = banded.select(col("doc_id").as("id_b"), col("sig").as("sig_b"),
      col("band"), col("bucket"))
    val joined = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
    time("band self-join count")(println("raw pairs: " + joined.count()))

    val pairs = joined
      .select(col("id_a"), col("id_b"),
        Dedup.minhashJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.4)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
    time("scored+dedup pairs")(println("pairs: " + pairs.count()))

    time("localCheckpoint")(pairs.localCheckpoint(true))
    sigsP.unpersist()

    time("full minhashPairs (e2e)") {
      Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.4)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
