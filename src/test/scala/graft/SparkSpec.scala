package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base for all suites: one shared session per JVM (suites run in one
  * forked JVM, so `getOrCreate` dedupes), small-core local mode. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Spark.session(cores = "4", appName = "graft-test")
  def sf001 = "/root/testdata/sf0.001"

  protected def initQuiet(): Unit = spark.sparkContext.setLogLevel("ERROR")
  initQuiet()
}
