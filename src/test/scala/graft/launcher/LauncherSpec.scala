package graft.launcher

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

class LauncherSpec extends AnyFunSuite {

  test("renderSubmit includes resources, confs, and args in order") {
    val cmd = Launcher.renderSubmit(Launcher.SubmitConf(
      appName = "graft-app", mainClass = "graft.Bench", jar = "graft.jar",
      conf = Map("spark.sql.shuffle.partitions" -> "64"),
      args = Seq("--sf", "0.1")))
    assert(cmd.startsWith("spark-submit --master yarn --deploy-mode cluster"))
    assert(cmd.contains("--conf spark.sql.shuffle.partitions=64"))
    assert(cmd.contains("--conf spark.dynamicAllocation.enabled=false"))
    assert(cmd.endsWith("graft.jar --sf 0.1"))
  }

  test("renderSubmit shell-quotes tokens a shell would re-split or expand") {
    val cmd = Launcher.renderSubmit(Launcher.SubmitConf(
      appName = "my app", mainClass = "graft.Bench", jar = "graft.jar",
      conf = Map("spark.executor.extraJavaOptions" -> "-XX:+UseG1GC -Xss4m"),
      args = Seq("it's", "plain")))
    // the space-carrying conf value must survive shell tokenization whole
    assert(cmd.contains("--conf 'spark.executor.extraJavaOptions=-XX:+UseG1GC -Xss4m'"))
    assert(cmd.contains("--name 'my app'"))
    assert(cmd.contains("'it'\\''s' plain"))
    // plain tokens stay unquoted for readability
    assert(cmd.contains("--master yarn"))
    // and the rendered line round-trips through a real shell into the
    // intended argv (the original bug: -Xss4m parsed as the app jar)
    val echoed = Launcher.runPool(Seq(Seq("sh", "-c",
      "printf '%s\\n' " + cmd.stripPrefix("spark-submit ")))).head
    val argv = echoed.stdout.split("\n").toSeq
    assert(argv.contains("spark.executor.extraJavaOptions=-XX:+UseG1GC -Xss4m"))
    assert(argv.contains("my app") && argv.contains("it's"))
    assert(argv.last == "plain")
  }

  test("dateChunks splits inclusively and clamps the tail") {
    val chunks = Launcher.dateChunks(
      LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 10), days = 4)
    assert(chunks == Seq(
      (LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 4)),
      (LocalDate.of(2024, 1, 5), LocalDate.of(2024, 1, 8)),
      (LocalDate.of(2024, 1, 9), LocalDate.of(2024, 1, 10))))
    assert(Launcher.rangeDays(chunks.head._1, chunks.head._2) == 4)
  }

  test("runPool executes commands concurrently with output capture") {
    val results = Launcher.runPool(Seq(
      Seq("sh", "-c", "echo out1"),
      Seq("sh", "-c", "echo 'submitted application_1700000000000_0042' >&2"),
      Seq("sh", "-c", "exit 3")), parallelism = 3)
    assert(results(0).exitCode == 0 && results(0).stdout.trim == "out1")
    assert(results(1).yarnAppId.contains("application_1700000000000_0042"))
    assert(results(2).exitCode == 3)
  }
}
