package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r13 A/B for q118's per-source rollup arm (verdict ask #5).
  *
  * OLD: documents LEFT JOIN cluster map → one aggregate with
  *      countDistinct(rep) — the distinct agg ships a (source, rep) row
  *      per DOCUMENT through its exchange.
  * NEW: plain per-source totals (map-side partial agg, 25-row exchange) +
  *      a clustered-docs-only inner join + small agg, recombined — the
  *      document-sized exchange is gone; only clustered docs (the tiny
  *      near-dup fraction) flow through a join.
  *
  * The cluster map is computed ONCE (checkpointed) and shared by both
  * shapes so the probe times the ROLLUP arms, not the kernel. Parity
  * asserted on the collected rows.
  */
object RollupProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = graft.core.Sessions.local("rollup-probe")
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val clusters = graft.dedup.Dedup.dupClusters(
        graft.dedup.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5))
      .withColumnRenamed("id", "doc_id")
      .localCheckpoint(true)

    def oldShape(): DataFrame =
      docs.join(clusters, Seq("doc_id"), "left")
        .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") === col("rep"), 1L).otherwise(0L))
            .as("n_kept"),
          sum(when(col("doc_id") === col("rep"), col("n_chars"))
            .otherwise(0L)).as("chars_kept"),
          countDistinct(col("rep")).as("n_clusters"))

    def newShape(): DataFrame = {
      val tot = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_tot"))
      val cl = docs.select(col("doc_id"), col("source"), col("n_chars"))
        .join(clusters, "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_clustered"),
          sum(when(col("doc_id") =!= col("cluster_id"), 1L).otherwise(0L))
            .as("n_dropped"),
          sum(when(col("doc_id") =!= col("cluster_id"), col("n_chars"))
            .otherwise(0L)).as("chars_dropped"),
          countDistinct(col("cluster_id")).as("n_cl"))
      tot.join(cl, tot("source") <=> cl("source"), "left")
        .select(tot("source").as("source"), col("n_docs"),
          (col("n_docs") - coalesce(col("n_dropped"), lit(0L))).as("n_kept"),
          (col("chars_tot") - coalesce(col("chars_dropped"), lit(0L)))
            .as("chars_kept"),
          (col("n_docs") - coalesce(col("n_clustered"), lit(0L)) +
            coalesce(col("n_cl"), lit(0L))).as("n_clusters"))
    }

    def time(tag: String, fn: () => DataFrame): Double = {
      spark.sparkContext.setJobDescription(s"rollup $tag")
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time("warm old", oldShape); time("warm new", newShape)
    val (as, bs) = (1 to reps).map { r =>
      (time(s"old rep$r", oldShape), time(s"new rep$r", newShape))
    }.unzip
    println(f"old min ${as.min}%.3f reps ${as.map(t => f"$t%.2f").mkString(" ")}")
    println(f"new min ${bs.min}%.3f reps ${bs.map(t => f"$t%.2f").mkString(" ")}")
    val a = oldShape().collect().map(_.toSeq).toSet
    val b = newShape().collect().map(_.toSeq).toSet
    println(s"parity: ${a == b} (old ${a.size} rows, new ${b.size} rows)")
    if (a != b) {
      println("old-only: " + (a -- b).take(5))
      println("new-only: " + (b -- a).take(5))
    }
    spark.stop()
    sys.exit(0)
  }
}
