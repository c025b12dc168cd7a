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
// Pass the forked JVM's stdout/stderr through verbatim instead of routing
// them via sbt's logger: the logger prefixes every stdout line with
// "[info] " (and stderr with "[error] "), which corrupts the bench's
// parse-me JSON line whenever sbt logs to a non-terminal.
run / outputStrategy := Some(StdoutOutput)
// The round driver tail-parses the bench's one-line JSON from the combined
// sbt output; sbt's "[success] Total time..." banner printed AFTER the
// forked JVM's last line broke that parse in rounds 11 and 12
// (BENCH_rNN.json "parsed": null). The banner itself is left alone (other
// tooling may look for it) — instead, a shutdown hook in sbt's OWN JVM
// re-prints the bench's JSON line as the absolute last line of output,
// but ONLY when this very invocation produced it (graft.Bench mirrors the
// printed line to BENCH_line.json; the hook fires iff that file's mtime
// is newer than this sbt process's start). compile/test invocations don't
// touch the file, so their output is unchanged. KNOWN LIMIT: the hook
// fires at sbt-JVM exit, i.e. it serves batch invocations (`sbt -batch
// "runMain graft.Bench"`, the driver's mode); in a long-lived sbt shell /
// sbtn server the re-print lands at server exit, not after the command —
// read BENCH_line.json directly in that mode.
val benchLineLastWordHook: Unit =
  if (System.getProperty("graft.benchLineHook") == null) {
    System.setProperty("graft.benchLineHook", "1")
    val benchLine = new java.io.File("BENCH_line.json").getAbsoluteFile
    val sbtStart = System.currentTimeMillis()
    java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try {
        if (benchLine.isFile && benchLine.lastModified() >= sbtStart) {
          val src = scala.io.Source.fromFile(benchLine)
          val line = try src.mkString.trim finally src.close()
          if (line.startsWith("{") && line.endsWith("}")) {
            System.out.println(line)
            System.out.flush()
          }
        }
      } catch { case _: Throwable => () }
    }))
  }
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
