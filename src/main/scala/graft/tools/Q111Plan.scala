package graft.tools

/** One-shot executed-plan dump for q111 (round-12 reshape): counts the
  * hot-node occurrences the PlanRegressionSpec pin asserts. Scratch
  * tooling — not part of the library surface. */
object Q111Plan {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.core.Sessions.local("graft-q111-plan")
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q111_copurchase_lift")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("[q111plan] collect_set=" + "collect_set".r.findAllIn(p).size +
      " Generate=" + "Generate".r.findAllIn(p).size +
      " posexplode=" + "posexplode".r.findAllIn(p).size +
      " slice=" + "slice\\(".r.findAllIn(p).size +
      " SMJ=" + "SortMergeJoin".r.findAllIn(p).size +
      " cartesian=" + "CartesianProduct".r.findAllIn(p).size +
      " inmem=" + "InMemoryTableScan".r.findAllIn(p).size)
    println(p)
    spark.stop()
  }
}
