package graft.plans

import graft.SparkSpec

/** The GraftExtensions SQL surface: every injected function must
  * resolve in `spark.sql` text and agree with the Scala DSL form. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("injected scalar functions resolve in SQL and match the DSL") {
    Seq((1L, Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f), "hello world"))
      .toDF("id", "a", "b", "s").createOrReplaceTempView("sql_surface_t")
    val r = spark.sql(
      """SELECT dot_product(a, b) AS dp, cosine_sim(a, b) AS cs,
        |  rolling_hash64(s) AS rh, simhash64(split(s, ' ')) AS sh
        |FROM sql_surface_t""".stripMargin).collect()(0)
    import org.apache.spark.sql.functions.{col, split}
    import graft.functions.GraftExpressions._
    val d = spark.table("sql_surface_t").select(
      dot_product(col("a"), col("b")), cosine_sim(col("a"), col("b")),
      rolling_hash64(col("s")), simhash64(split(col("s"), " "))).collect()(0)
    assert(r.getDouble(0) == d.getDouble(0) && r.getDouble(1) == d.getDouble(1))
    assert(r.getLong(2) == d.getLong(2) && r.getLong(3) == d.getLong(3))
    assert(r.getDouble(0) == 10.0) // 3 + 4 + 3
  }

  test("injected generator and literal-arity functions work in SQL") {
    Seq("a b c d").toDF("text").createOrReplaceTempView("sql_surface_g")
    val shingles = spark.sql(
      "SELECT explode_shingles(text, 3) AS sh FROM sql_surface_g")
      .as[String].collect().sorted
    assert(shingles.toSeq == Seq("a b c", "b c d"))
    val sig = spark.sql(
      "SELECT minhash_signature(array('x', 'y'), 4) AS sig FROM sql_surface_g")
      .selectExpr("size(sig)").as[Int].collect()
    assert(sig.toSeq == Seq(4))
  }

  test("sig_agreement resolves in SQL") {
    val v = spark.sql(
      "SELECT sig_agreement(array(1L, 2L, 3L, 4L), array(1L, 9L, 3L, 9L)) AS j")
      .as[Double].collect()
    assert(v.toSeq == Seq(0.5))
  }
}
