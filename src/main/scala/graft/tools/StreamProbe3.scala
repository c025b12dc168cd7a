package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams

/** r12: q62's state width was probed (4 beat 8); q42 (stateful windowed
  * agg) and q117 (dedup state) never were. Times both at widths 2/4/8.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.StreamProbe3 [reps]"
  */
object StreamProbe3 {

  private def q42(outer: SparkSession, dir: String, width: Int): DataFrame = {
    val s = outer.newSession()
    s.conf.set("spark.sql.shuffle.partitions", width.toString)
    s.conf.set("spark.sql.streaming.checkpointLocation",
      graft.core.Scratch.checkpointBase)
    val tmp = graft.core.Scratch.tempDir("p42")
    Files.copy(Paths.get(s"$dir/events.parquet"), tmp.resolve("events.parquet"))
    val events = graft.core.Tables.normalizeEventTs(s.readStream
      .schema(graft.core.Tables.fileSchema(s, s"$dir/events.parquet"))
      .parquet(tmp.toString))
    val agg = events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_epoch"),
        col("event_type"), col("n_events"), col("sum_value"))
    val name = "p42_" + java.util.UUID.randomUUID.toString.replace("-", "")
    Streams.runToMemory(agg, name, OutputMode.Complete())
  }

  private def q117(outer: SparkSession, dir: String, width: Int): DataFrame = {
    val s = outer.newSession()
    s.conf.set("spark.sql.shuffle.partitions", width.toString)
    s.conf.set("spark.sql.streaming.checkpointLocation",
      graft.core.Scratch.checkpointBase)
    val tmp = graft.core.Scratch.tempDir("p117")
    Files.copy(Paths.get(s"$dir/events.parquet"), tmp.resolve("events.parquet"))
    val events = graft.core.Tables.normalizeEventTs(s.readStream
      .schema(graft.core.Tables.fileSchema(s, s"$dir/events.parquet"))
      .parquet(tmp.toString))
    val deduped = Streams.dedupWithinWatermark(events,
        Seq("user_id", "event_type"), watermark = "2 hours")
      .select(col("user_id"), col("event_type"))
    val name = "p117_" + java.util.UUID.randomUUID.toString.replace("-", "")
    Streams.runToMemory(deduped, name, OutputMode.Append())
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = graft.core.Sessions.local("stream-probe3")
    def time(fn: => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn.count()
      (System.nanoTime() - t0) / 1e9
    }
    Seq(("q42", q42 _), ("q117", q117 _)).foreach { case (tag, f) =>
      time(f(spark, dir, 8)) // warm the operator stack
      Seq(2, 4, 8).foreach { w =>
        val ts = (1 to reps).map(_ => time(f(spark, dir, w)))
        println(f"$tag width=$w min ${ts.min}%.3f reps ${ts.map(t => f"$t%.2f").mkString(" ")}")
      }
    }
    spark.stop()
  }
}
