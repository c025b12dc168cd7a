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
