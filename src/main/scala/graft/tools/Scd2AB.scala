package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
/** r12: q71's incremental fold pays an EAGER localCheckpoint per batch (3
  * extra jobs). A/B against lazy checkpoints (same truncation, materialized
  * by the final action). */
object Scd2AB {
  def build(s: SparkSession, dir: String, eager: Boolean): DataFrame = {
    import graft.warehouse.Cdc
    val events = graft.core.Tables.load(s, dir, "events")
    def batchSnapshot(i: Int) = Cdc.addContentHash(
      Cdc.snapshot(
        events.filter(col("event_id") % 3 === i)
          .select(col("user_id"), col("event_id"), col("event_type"), col("value")),
        Seq("user_id"), Seq("event_id"))
        .drop("event_id"),
      Seq("event_type", "value"))
    val historySchema = batchSnapshot(0)
      .withColumn("effective_from", lit(null).cast("long"))
      .withColumn("effective_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true)).schema
    val empty = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], historySchema)
    (0 until 3).foldLeft(empty) { (h, i) =>
      Cdc.scd2Merge(h, batchSnapshot(i), Seq("user_id"), asOf = i.toLong)
        .localCheckpoint(eager)
    }.select(col("user_id"), col("event_type"), col("value"),
      col("effective_from"), col("effective_to"), col("is_current"))
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("scd2-ab")
    def time(fn: => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }
    time(build(spark, dir, true)); time(build(spark, dir, false))
    val (es, ls) = (1 to 4).map(_ =>
      (time(build(spark, dir, true)), time(build(spark, dir, false)))).unzip
    println(f"eager min ${es.min}%.3f reps ${es.map(t => f"$t%.2f").mkString(" ")}")
    println(f"lazy  min ${ls.min}%.3f reps ${ls.map(t => f"$t%.2f").mkString(" ")}")
    val a = build(spark, dir, true).collect().map(_.toSeq).toSet
    val b = build(spark, dir, false).collect().map(_.toSeq).toSet
    println(s"parity: ${a == b} (${a.size} rows)")
    spark.stop()
  }
}
