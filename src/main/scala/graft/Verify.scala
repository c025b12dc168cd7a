package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // The library's canonical session factory, so the correctness dump runs
    // under exactly the engine settings users of Sessions.local get — a
    // hand-rolled builder here had already drifted from it (Kryo, explicit
    // AQE flags), and any future engine-relevant conf would have to be
    // kept in sync by hand across three copies.
    val spark = graft.core.Sessions.local(
      appName = "graft-verify",
      cores = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(4))
    graft.core.Scratch.cleanStale()
    // SPARK_GRAFT_FORCE_TWINS=1: force every kernel/driver-shortcut guard
    // to 0 so the declarative/distributed fallbacks are the PRIMARY path
    // for the whole suite — the suite-level twin gate (round-12 judge
    // ask). The pairwise parity specs prove each twin equals its kernel;
    // this run proves the composed 134-query oracle surface holds when
    // every guard declines at once (the 100 TB posture, where corpora
    // never fit a driver collect).
    if (sys.env.get("SPARK_GRAFT_FORCE_TWINS").contains("1")) {
      graft.core.Gates.All.foreach(k => spark.conf.set(k, "0"))
      System.err.println("[verify] FORCE_TWINS: all driver-shortcut " +
        "guards set to 0 — declarative fallbacks are primary")
    }
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q78_x,q40_y limits the dump to named queries (same
    // knob as Bench) — local iteration aid; the driver runs the full set.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // a typo'd name would silently select nothing and read as "0 failures"
    val unknown = only.diff(SparkEntry.queries.keySet)
    if (unknown.nonEmpty)
      System.err.println(
        s"[verify] SPARK_GRAFT_ONLY names match no query: ${unknown.mkString(", ")}")
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only.contains(n) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
