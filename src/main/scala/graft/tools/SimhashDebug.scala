package graft.tools

import org.apache.spark.sql.functions._
import graft.Spark
import graft.io.Sources
import graft.ops.{Dedup, TextAnalysis}
import graft.functions.GraftExpressions

/** One-off instrumentation of dedup_simhash stages. */
object SimhashDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Spark.session(appName = "graft-simhash-debug")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Sources.table(spark, sfDir, "documents")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val sh = Sources.fanOut(docs, "doc_id")
      .withColumn("simhash",
        GraftExpressions.simhash64(TextAnalysis.tokens(col("text"))))
      .select(col("doc_id"), col("simhash"))
      .persist()
    time("simhash materialize")(println("n=" + sh.count()))

    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).as("bucket"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bucket"))
    val sizes = banded.groupBy("band", "bucket").count()
    time("bucket histogram") {
      sizes.orderBy(col("count").desc).show(5)
      sizes.selectExpr("sum(count*(count-1)/2) as candidate_pairs").show()
    }

    time("full simHashPairs x1") {
      Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 8)
        .write.format("noop").mode("overwrite").save()
    }
    time("full simHashPairs x2") {
      Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 8)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
