package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams

/** r13 follow-up: q62's state width (shuffle partitions = state stores/4)
  * was tuned in r12 against the HDFS-backed provider, whose per-store
  * delta-file commit priced extra partitions. The memory provider changed
  * that cost model — re-probe widths under it, same-session alternating,
  * min-of-N. (q42/q117 widths ride the same logic at width 8.) */
object StreamProbe5 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val spark = graft.core.Sessions.local("stream-probe5")
    graft.core.Scratch.cleanStale()
    val stage = graft.core.Scratch.tempDir("probe5src")
    Files.copy(Paths.get(s"$dir/events.parquet"), stage.resolve("events.parquet"))

    def quiesce(): Unit = {
      try org.apache.spark.sql.graft.Bridge.stopStateStores()
      catch { case _: Throwable => () }
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      System.gc()
    }

    def runQ62(width: Int): (Double, Long) = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", width.toString)
      s.conf.set("spark.sql.streaming.checkpointLocation",
        graft.core.Scratch.checkpointBase)
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        org.apache.spark.sql.graft.MemoryStateStoreProvider.ProviderName)
      val srcSchema = graft.core.Tables.fileSchema(s, s"$dir/events.parquet")
      def src() = graft.core.Tables.normalizeEventTs(
        s.readStream.schema(srcSchema).parquet(stage.toString))
      val views = src().filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
          col("ts").as("v_ts"))
      val buys = src().filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
          col("ts").as("b_ts"))
      val t0 = System.nanoTime()
      val joined = Streams.intervalJoin(views, buys,
          "v_user", "b_user", "v_ts", "b_ts",
          within = "1 hour", watermark = "2 hours")
        .select(col("v_user").as("user_id"), col("view_id"), col("buy_id"),
          (unix_micros(col("b_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
      val name = "p5_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val out = Streams.runToMemory(joined, name, OutputMode.Append())
      out.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val n = out.count()
      quiesce()
      (dt, n)
    }

    val widths = Seq(2, 4, 8, 16)
    widths.foreach(runQ62) // warm
    val acc = scala.collection.mutable.Map.empty[Int, List[Double]]
      .withDefaultValue(Nil)
    var rowsSeen = Set.empty[Long]
    for (r <- 1 to reps; w <- widths) {
      spark.sparkContext.setJobDescription(s"probe5 q62 width=$w rep$r")
      val (dt, n) = runQ62(w)
      rowsSeen += n
      acc(w) = acc(w) :+ dt
      System.err.println(f"[probe5] q62 width=$w rep$r $dt%.2fs rows=$n")
    }
    widths.foreach { w =>
      val v = acc(w)
      println(f"q62 width=$w min ${v.min}%.2f reps ${v.map(t => f"$t%.2f").mkString(",")}")
    }
    println(s"row-count parity across widths: ${rowsSeen.size == 1} ($rowsSeen)")
    spark.stop()
    sys.exit(0)
  }
}
