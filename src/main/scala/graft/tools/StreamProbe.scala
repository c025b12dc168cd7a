package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** q62/q63 cost decomposition (round 12): where do the streaming queries'
  * seconds actually go — fixture staging, micro-batch machinery, state
  * store backend? Scratch tooling — not part of the library surface. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outer = graft.core.Sessions.local("graft-stream-probe")
    outer.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    // warm: one full q63 + q62 off the clock
    graft.SparkEntry.queries("q63_stream_upsert")(outer, dir).count()
    graft.SparkEntry.queries("q62_stream_interval_join")(outer, dir).count()

    (1 to 3).foreach { rep =>
      // --- q63 decomposition -------------------------------------------
      val s = outer.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val tmp = Files.createTempDirectory("graft_probe63")
      val src = tmp.resolve("in"); val tgt = tmp.resolve("tgt")
      Files.createDirectories(src)
      val events = graft.core.Tables.load(s, dir, "events")
      t(s"q63.stage rep$rep") {
        (0 until 3).foreach { i =>
          events.filter(col("event_id") % 3 === i)
            .coalesce(1).write.mode("append").parquet(src.toString)
        }
      }
      t(s"q63.stream rep$rep") {
        val stream = s.readStream.schema(events.schema)
          .option("maxFilesPerTrigger", 1).parquet(src.toString)
        val q = graft.streaming.Streams.upsertSink(stream, tgt.toString,
            tmp.resolve("chk").toString, pks = Seq("user_id"), orderCol = "event_id")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      t(s"q63.read rep$rep") {
        s.read.parquet(tgt.toString).count()
      }

      // --- q62: batch count + state store backend ----------------------
      def q62(backend: String): Unit = {
        val s2 = outer.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", "8")
        if (backend == "rocksdb")
          s2.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val tmp2 = Files.createTempDirectory("graft_probe62")
        Files.copy(Paths.get(s"$dir/events.parquet"), tmp2.resolve("events.parquet"))
        val srcSchema = graft.core.Tables.fileSchema(s2, s"$dir/events.parquet")
        def src2() = graft.core.Tables.normalizeEventTs(
          s2.readStream.schema(srcSchema).parquet(tmp2.toString))
        val views = src2().filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
            col("ts").as("v_ts"))
        val buys = src2().filter(col("event_type") === "purchase")
          .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
            col("ts").as("b_ts"))
        val joined = graft.streaming.Streams.intervalJoin(views, buys,
            "v_user", "b_user", "v_ts", "b_ts",
            within = "1 hour", watermark = "2 hours")
          .select(col("v_user").as("user_id"), col("view_id"), col("buy_id"),
            (unix_micros(col("b_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
        val name = "probe62_" + java.util.UUID.randomUUID.toString.replace("-", "")
        t(s"q62.$backend rep$rep") {
          val q = joined.writeStream.format("memory").queryName(name)
            .outputMode(OutputMode.Append())
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          println(s"[probe] q62.$backend batches=" +
            q.recentProgress.map(_.batchId).distinct.length +
            " rows=" + s2.table(name).count())
          s2.catalog.dropTempView(name)
        }
      }
      q62("hdfs")
      q62("rocksdb")
    }
    outer.stop()
  }
}
