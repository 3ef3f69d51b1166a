ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pybabespark"
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
// Forked-run stdout must bypass sbt's logger: under `sbt -error` (the
// canonical tools/bench.sh invocation) logger-routed output is suppressed,
// which would eat the one JSON line Bench prints. StdoutOutput inherits the
// parent's stdout fd directly, so the JSON survives any sbt log level.
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
// 24g default heap (was 8g): local[32] runs 32 concurrent tasks in ONE JVM,
// so 8g gave each task ~250 MB — an under-provisioned harness artifact, not
// a representative executor config (a production 32-core node carries
// 32-64 GB). The round-11 bench bimodality (q154 16-87 s with 5.7 s GC
// pauses in some sessions vs 1.6-2.1 s in others; q176 first-run spikes)
// was session-state GC thrash near that 8g ceiling: the round-12 A/B run
// (BENCH_ab_sf0.1.json) shows the SAME code flat across the watchlist in a
// healthy JVM, so the heap — the only uncontrolled variable — is what
// differed. The host has 125 GiB; 24g keeps allocation-heavy dedup queries
// (gram explodes, md5 per shingle) out of the GC cliff at sf0.1-sf1.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
