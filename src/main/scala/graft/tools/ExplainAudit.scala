package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkEntry

/** Physical-plan audit over every SparkEntry query: prints, per query, the
  * scan-level pushdown evidence (PushedFilters / ReadSchema width), join
  * strategies chosen, whole-stage-codegen span count, and exchange count —
  * the four things that decide whether a plan survives a 100× scale-up.
  *
  * Usage: `sbt "runMain graft.tools.ExplainAudit [queryName ...]"`
  * (no args = all queries). Full formatted plans with -Dgraft.plans=full.
  */
object ExplainAudit {

  final case class Audit(name: String, exchanges: Int, broadcasts: Int,
                         sortMerge: Int, hashJoins: Int, nestedLoop: Int,
                         codegenSpans: Int, scans: Seq[String])

  private def collectPlan(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children ++ p.subqueries).flatMap(collectPlan)

  def audit(spark: SparkSession, name: String,
            fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            sfDir: String): Audit = {
    val df = fn(spark, sfDir)
    val executed = df.queryExecution.executedPlan
    // Materialize adaptive plans? No — audit the initial physical plan; AQE
    // re-plans at runtime but strategy intent shows up here.
    val nodes = collectPlan(executed match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    })
    def count(pred: String => Boolean): Int =
      nodes.count(n => pred(n.nodeName.toLowerCase))
    val scans = nodes.filter(_.nodeName.toLowerCase.contains("scan"))
      .map { s =>
        val meta = s.toString.linesIterator.take(1).mkString
        val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(s.toString).getOrElse("")
        val schema = "ReadSchema: [^,\n]*".r.findFirstIn(s.toString).getOrElse("")
        s"${meta.take(90)} $pushed ${schema.take(120)}"
      }
    Audit(name,
      exchanges = count(_.contains("exchange")),
      broadcasts = count(_.contains("broadcast")),
      sortMerge = count(_.contains("sortmergejoin")),
      hashJoins = count(n => n.contains("hashjoin") && !n.contains("broadcast")),
      nestedLoop = count(_.contains("nestedloop")),
      codegenSpans = count(_.contains("wholestagecodegen")),
      scans = scans)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // AQE off for the audit only: under AQE codegen collapse happens per
    // query stage at materialization, so the static plan would always show
    // zero WholeStageCodegen spans. Production sessions keep AQE on.
    val spark = graft.core.Sessions.local("graft-explain",
      extraConf = Map("spark.sql.adaptive.enabled" -> "false"))
    val full = sys.props.get("graft.plans").contains("full")
    val wanted = if (args.isEmpty) SparkEntry.queries.keySet else args.toSet
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted(n) }
      .foreach { case (name, fn) =>
        try {
          val a = audit(spark, name, fn, sfDir)
          println(f"${a.name}%-24s exch=${a.exchanges}%-3d bcast=${a.broadcasts}%-3d " +
            f"smj=${a.sortMerge}%-2d shj=${a.hashJoins}%-2d bnlj=${a.nestedLoop}%-2d " +
            f"codegen=${a.codegenSpans}%-3d scans=${a.scans.size}")
          a.scans.foreach(s => println(s"    $s"))
          if (full) fn(spark, sfDir).explain("formatted")
        } catch {
          case e: Exception => println(s"$name AUDIT FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
