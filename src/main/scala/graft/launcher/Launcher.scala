package graft.launcher

import java.time.LocalDate
import java.time.temporal.ChronoUnit

/** Operational edge: spark-submit command rendering and date-range chunking
  * for backfills (reference: utils/spark_submit_utils.py:57-80,
  * Utilities.py:382-457). Thin driver-side strings — not engine code; kept
  * for surface parity. */
object Launcher {

  final case class SubmitConf(
      appName: String,
      mainClass: String,
      jar: String,
      master: String = "yarn",
      deployMode: String = "cluster",
      driverMemory: String = "1g",
      executorMemory: String = "1g",
      numExecutors: Int = 2,
      executorCores: Int = 1,
      conf: Map[String, String] = Map.empty,
      args: Seq[String] = Nil)

  /** Single-quote a token for POSIX shells when it contains anything a
    * shell would re-tokenize or expand — conf values with spaces
    * (`-XX:+UseG1GC -Xss4m`), app names with spaces, globs, `$`s. Plain
    * tokens render as-is so the common command stays readable. */
  private def shellQuote(s: String): String =
    if (s.nonEmpty && s.forall(ch => ch.isLetterOrDigit || "._-/:=,+@%".contains(ch))) s
    else "'" + s.replace("'", "'\\''") + "'"

  /** Render the spark-submit command line (reference parity with
    * sbin/execute-tasks-spark-submit.sh:40-52 defaults). Every
    * caller-supplied token is shell-quoted: an executor-JVM-options conf
    * with embedded spaces used to split into stray spark-submit arguments
    * when the rendered string reached a shell. */
  def renderSubmit(c: SubmitConf): String = {
    val confs = (Map(
      "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer",
      "spark.dynamicAllocation.enabled" -> "false",
      "spark.yarn.maxAppAttempts" -> "1") ++ c.conf)
      .toSeq.sortBy(_._1).flatMap { case (k, v) => Seq("--conf", s"$k=$v") }
    (Seq("spark-submit",
      "--master", c.master, "--deploy-mode", c.deployMode,
      "--name", c.appName, "--class", c.mainClass,
      "--driver-memory", c.driverMemory, "--executor-memory", c.executorMemory,
      "--num-executors", c.numExecutors.toString,
      "--executor-cores", c.executorCores.toString) ++
      confs ++ Seq(c.jar) ++ c.args).map(shellQuote).mkString(" ")
  }

  /** Split [start, end] into chunks of at most `days` days — one backfill
    * run each (reference: Utilities.py:382-407). Inclusive bounds. */
  def dateChunks(start: LocalDate, end: LocalDate, days: Int): Seq[(LocalDate, LocalDate)] = {
    require(days > 0 && !end.isBefore(start), s"bad range [$start, $end] / $days")
    Iterator.iterate(start)(_.plusDays(days))
      .takeWhile(!_.isAfter(end))
      .map(s => s -> Seq(s.plusDays(days - 1L), end).min(Ordering.by((d: LocalDate) => d.toEpochDay)))
      .toSeq
  }

  /** Total days in an inclusive range (chunk sizing helper). */
  def rangeDays(start: LocalDate, end: LocalDate): Long =
    ChronoUnit.DAYS.between(start, end) + 1

  final case class RunResult(command: Seq[String], exitCode: Int,
                             stdout: String, stderr: String) {
    /** First YARN application id in the output, if any (reference parses
      * submit stderr for it, Utilities.py:417-437). */
    def yarnAppId: Option[String] =
      "application_\\d+_\\d+".r.findFirstIn(stderr + "\n" + stdout)
  }

  /** Execute commands in a bounded process pool (reference:
    * Utilities.py:440-457 multiprocess spark-submit pool) — `parallelism`
    * concurrent edge-node processes, full output capture per command,
    * original ordering preserved. */
  def runPool(commands: Seq[Seq[String]], parallelism: Int = 4): Seq[RunResult] = {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = commands.map { cmd =>
        Future {
          val pb = new ProcessBuilder(cmd: _*)
          val proc = pb.start()
          // Drain stderr on its own thread: spark-submit logs mostly to
          // stderr, and a child blocked writing a full stderr pipe while we
          // block reading stdout is a mutual deadlock.
          val errF = Future(new String(proc.getErrorStream.readAllBytes(), "UTF-8"))(
            ExecutionContext.global)
          val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
          val err = Await.result(errF, Duration.Inf)
          RunResult(cmd, proc.waitFor(), out, err)
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally pool.shutdown()
  }
}
