ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "serverlesscovariatedriftdetectionspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// One forked JVM, suites SEQUENTIAL: every suite shares one SparkSession
// (SparkTestBase), and sbt's default suite-level parallelism made
// concurrently-scheduled jobs perturb KLL sketch merge orders enough to
// flake the fused-vs-split comparison rarely (~1 in 6 full runs).
// Sequential execution costs ~1 min of suite wall and removes the whole
// shared-session concurrency class.
Test / parallelExecution := false
run / fork := true
// Forked `run` output is inherited UNPREFIXED instead of routed through
// sbt's logger: the bench's one machine-parseable JSON metric line must not
// be wrapped in "[info]" decoration (the driver tail-parses sbt stdout;
// BENCH_r02 recorded "parsed": null because of the wrapping). Spark's own
// logging goes to stderr, so stdout carries only the metric line.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
// Benchmark/run JVMs: fixed pre-touched heap. This sandbox kernel's page
// faults cost ~9 CPU-seconds/GB of system time (measured ~100x a normal
// kernel), so on-demand heap growth + G1 uncommit/recommit cycles inject
// multi-second sys-time storms into timed passes. Paying all faults once at
// JVM start (untimed setup) removes them. Not applied to test forks.
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  "-XX:+AlwaysPreTouch",
)
