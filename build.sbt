ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datapipelinesessentialspythonspark"
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
// The round driver tail-parses the bench's one-line JSON from the combined
// sbt output; sbt's "[success] Total time..." banner printed AFTER the
// forked JVM's last line broke that parse in rounds 11 and 12
// (BENCH_rNN.json "parsed": null). Suppressing the banner makes
// graft.Bench's JSON line the literal last line of output. Failures still
// print normally ([error] + non-zero exit).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Pass the forked JVM's stdout/stderr through verbatim instead of routing
// them via sbt's logger: the logger prefixes every stdout line with
// "[info] " (and stderr with "[error] "), which corrupts the bench's
// parse-me JSON line whenever sbt logs to a non-terminal.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: the bench/verify JVM hosts all 32 local executor threads;
  // 8g left it GC-bound on the shuffle-heavy queries (multi-second pauses
  // showing up as 10-40x per-query variance run-to-run).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 134 codegen'd queries overflow the default 240 MB JIT code cache
  // mid-suite; once it fills, compilation stops/flushes and later queries
  // run partially interpreted — measured as q111 (the suite's widest
  // codegen surface) at 0.90s isolated vs 1.2-1.6s after 100+ queries.
  "-XX:ReservedCodeCacheSize=1g",
)
