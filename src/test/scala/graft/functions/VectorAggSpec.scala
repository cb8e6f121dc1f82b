package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources

class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  test("quantizedVectorSum: hand-computed values, ragged + null inputs") {
    val df = Seq(
      (0, Array(1.0f, 2.0f)),
      (0, Array(0.5f, -0.5f, 3.0f)), // ragged: zero-pads the others
      (1, null.asInstanceOf[Array[Float]])
    ).toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(VectorAgg.quantized_vector_sum($"v").as("qv"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    // floor(1.0*1000)+floor(0.5*1000)=1500; floor(2000)+floor(-500)=1500
    assert(got(0) == Seq(1500L, 1500L, 3000L))
    assert(got(1) == Seq.empty) // null-only group -> zero buffer
  }

  test("quantizedVectorSum: partition-count invariant, matches explode formulation") {
    val emb = Sources.table(spark, sf001, "embeddings")
    def viaUdaf(df: org.apache.spark.sql.DataFrame) = df.groupBy($"label")
      .agg(VectorAgg.quantized_vector_sum($"embedding").as("qv"))
      .select($"label", posexplode($"qv").as(Seq("pos", "qsum")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val onePart = viaUdaf(emb.coalesce(1))
    val manyParts = viaUdaf(emb.repartition(16))
    assert(onePart == manyParts) // integer quantization commutes exactly
    val viaExplode = emb
      .select($"label", posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"label", $"pos")
      .agg(sum(floor($"x".cast("double") * 1000).cast("long")).as("qsum"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(onePart == viaExplode)
  }

  test("quantizedVectorSum is SQL-registered and callable") {
    VectorAgg.register(spark)
    Sources.table(spark, sf001, "embeddings").createOrReplaceTempView("emb_va")
    val r = spark.sql(
      """SELECT label, quantized_vector_sum(embedding) AS qv
        |FROM emb_va GROUP BY label""".stripMargin).collect()
    assert(r.length == 10 && r.forall(_.getSeq[Long](1).length == 64))
  }
}
