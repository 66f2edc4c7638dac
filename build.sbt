ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dystonsegtfsimporterspark"
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
// Forked runMain output must pass through UNPREFIXED: the bench driver
// parses the program's single JSON stdout line, and sbt's default
// LoggedOutput strategy wraps it in "[info] " (BENCH_r01/r02 parsed:null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// 24g default: the bench/verify mains run local[32] with the shared caches
// (shingle index, pair sets, ANN top-k, fixture pipeline) resident — 8g put
// the old-gen near capacity and made bench totals swing ~±20 % with GC.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// The test suite shares one SparkSession per forked JVM (getOrCreate) and
// suites cache records/shingles/curve tables — 8g starves the unified
// memory manager into an eviction storm on the full run.
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_TEST_MEM", "24g")}"
