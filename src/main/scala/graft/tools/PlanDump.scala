package graft.tools

import org.apache.spark.sql.execution.FormattedMode

import graft.SparkEntry

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the committed plan evidence under plans/r12/.
  *
  * Usage: sbt "runMain graft.tools.PlanDump <outDir> <suffix> <query ...>"
  * (suffix = "before" | "after"). AQE disabled so the static plan shape
  * (exchanges, join strategies, codegen spans) is visible; the bench runs
  * with AQE on, which only coalesces/re-plans at runtime.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query ...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("plan-dump",
      extraConf = Map("spark.sql.adaptive.enabled" -> "false"))
    // Optional session confs (r13), e.g. gate keys, so BOTH sides of a
    // size-gated shape can be dumped from one tree:
    // SPARK_GRAFT_CONF="spark.graft.corpus.tfSmallInputMaxBytes=0"
    // (comma-separated k=v pairs; values containing commas aren't
    // supported — none of the gate keys need them)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").map(_.trim)
      .filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k.trim, v.trim)
          case _ => println(s"IGNORED malformed SPARK_GRAFT_CONF entry: $kv")
        }
      })
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val plan = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
          val f = outDir.resolve(s"${name}_$suffix.txt")
          java.nio.file.Files.write(f, plan.getBytes("UTF-8"))
          println(s"wrote $f (${plan.length} chars)")
        case None => println(s"UNKNOWN query $name")
      }
    }
    spark.stop()
  }
}
