ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "incubatorbeamspark"
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
// Bench/Verify emit machine-parsed JSON on stdout. sbt's default
// LoggedOutput strategy reframes every forked-process line as
// "[info] <line>" and appends a "[success] Total time..." banner, so the
// driver's tail-parser never saw a bare, final JSON line (BENCH r5–r7:
// parsed:null). StdoutOutput inherits the child's stdout/stderr directly
// (no prefix), and showSuccess drops the trailing banner — the last
// stdout line of `sbt -batch "runMain graft.Bench"` is the headline JSON.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not another task —
// lintUnused can't see that
Global / excludeLintKeys += showSuccess
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
  // 24g default: the full bench (202-query gate + TPC-DS x10 + Nexmark
  // tiers + the 1M-doc pipeline tier) shares one local[32] JVM; 8g OOM'd
  // (Spark exit 52) once the pipeline tier ran last. Host has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
