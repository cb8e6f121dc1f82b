ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "realtimeeventdrivendatapipelineforanecommerceshopspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked `runMain` output goes straight to this process's stdout instead
// of through sbt's logger: the driver parses graft.Bench's single JSON
// result line, and sbt's "[info] " prefix breaks that parse.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Right-size the forked heap instead of taking SPARK_DRIVER_MEM verbatim:
// a ~90g heap buys nothing for these sub-minute local[32] jobs (working
// set is far below 16g at sf0.1) and sampled consistently slower on the
// full bench (G1 young-gen sizing and lazy page-commit scale with -Xmx),
// though this host also shows multi-second run-to-run noise. Spark spills
// to disk if a bigger SF ever outgrows the cap.
val heapCapBytes = 16L << 30
def memToBytes(s: String): Long = {
  val t = s.trim.toLowerCase
  val (num, mult) = t.last match {
    case 'k' => (t.init, 1L << 10)
    case 'm' => (t.init, 1L << 20)
    case 'g' => (t.init, 1L << 30)
    case 't' => (t.init, 1L << 40)
    case _   => (t, 1L)
  }
  (num.toDouble * mult).toLong
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${math.min(memToBytes(sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")), heapCapBytes)}",
)
