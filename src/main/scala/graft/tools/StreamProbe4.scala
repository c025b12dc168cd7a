package graft.tools

import graft.queries.StreamQueries

/** r13 A/B: process-memory state-store provider vs the durable default on
  * the stateful streaming queries (q42/q62/q117) plus q63 (stateless sink;
  * rides along as a control — its gate read is a no-op). Both shapes timed
  * alternately in ONE process, min-of-N (the bench-drift rule: never
  * accept a cross-run diff). Row parity asserted per query per rep. */
object StreamProbe4 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(4)
    val spark = graft.core.Sessions.local("stream-probe4")
    graft.core.Scratch.cleanStale()
    val names = Seq("q42_stream_tumbling", "q62_stream_interval_join",
      "q117_stream_dedup", "q63_stream_upsert")

    def quiesce(): Unit = {
      try org.apache.spark.sql.graft.Bridge.stopStateStores()
      catch { case _: Throwable => () }
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
      System.gc()
    }

    def run(name: String, gate: String): (Double, Long) = {
      spark.conf.set(graft.core.Gates.StreamMemoryStateStore, gate)
      val t0 = System.nanoTime()
      val df = StreamQueries.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val n = df.count()
      quiesce()
      (dt, n)
    }

    // warm both shapes off the clock
    names.foreach { n => run(n, "1"); run(n, "0") }
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
      .withDefaultValue(Nil)
    for (r <- 1 to reps; gate <- Seq("1", "0"); n <- names) {
      spark.sparkContext.setJobDescription(s"probe4 $n gate=$gate rep$r")
      val (dt, rows) = run(n, gate)
      acc((n, gate)) = acc((n, gate)) :+ dt
      System.err.println(f"[probe4] $n gate=$gate rep$r $dt%.2fs rows=$rows")
    }
    names.foreach { n =>
      val on = acc((n, "1")); val off = acc((n, "0"))
      println(f"$n mem=${on.min}%.2f (${on.map(t => f"$t%.2f").mkString(",")}) " +
        f"durable=${off.min}%.2f (${off.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
    sys.exit(0)
  }
}
