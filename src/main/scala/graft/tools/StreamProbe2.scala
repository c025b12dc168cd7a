package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Round-12 q62/q63 tuning A/B: scratch filesystem (ext4 /tmp vs tmpfs
  * /dev/shm), shuffle-partition width, upsert bucket count, staged-input
  * reuse. Scratch tooling — not part of the library surface. */
object StreamProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outer = graft.core.Sessions.local("graft-stream-probe2")
    outer.sparkContext.setLogLevel("WARN")

    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe2] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    def scratch(root: String, prefix: String) =
      Files.createTempDirectory(Paths.get(root), prefix)

    // ---- q62 variants ----------------------------------------------------
    def q62(label: String, root: String, parts: Int): Unit = {
      val s2 = outer.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val chk = scratch(root, "graft_p62chk")
      s2.conf.set("spark.sql.streaming.checkpointLocation", chk.toString)
      val tmp2 = scratch(root, "graft_p62")
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
      val name = "p62_" + java.util.UUID.randomUUID.toString.replace("-", "")
      t(label) {
        val q = joined.writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Append())
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val n = s2.table(name).count()
        require(n == 342L, s"row drift: $n")
        s2.catalog.dropTempView(name)
      }
    }

    // ---- q63 variants ----------------------------------------------------
    // staged once per root: the INPUT is immutable across runs
    val stagedSrc = scala.collection.mutable.Map.empty[String, String]
    def q63(label: String, root: String, buckets: Int, reuseSrc: Boolean): Unit = {
      val s = outer.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val events = graft.core.Tables.load(s, dir, "events")
      def stage(): String = {
        val p = scratch(root, "graft_p63src")
        (0 until 3).foreach { i =>
          events.filter(col("event_id") % 3 === i)
            .coalesce(1).write.mode("append").parquet(p.toString)
        }
        p.toString
      }
      val src =
        if (reuseSrc) stagedSrc.getOrElseUpdate(root, stage()) else stage()
      val base = scratch(root, "graft_p63")
      val tgt = base.resolve("tgt")
      t(label) {
        val stream = s.readStream.schema(events.schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
        val q = graft.streaming.Streams.upsertSink(stream, tgt.toString,
            base.resolve("chk").toString, pks = Seq("user_id"),
            orderCol = "event_id", numBuckets = buckets)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val n = s.read.parquet(tgt.toString).count()
        require(n > 0, "empty target")
      }
    }

    // warm
    q62("warm62", "/tmp", 8)
    q63("warm63", "/tmp", 16, reuseSrc = false)
    (1 to 3).foreach { r =>
      q62(s"q62 tmp p8    rep$r", "/tmp", 8)
      q62(s"q62 shm p8    rep$r", "/dev/shm", 8)
      q62(s"q62 shm p4    rep$r", "/dev/shm", 4)
      q62(s"q62 shm p2    rep$r", "/dev/shm", 2)
      q63(s"q63 tmp b16   rep$r", "/tmp", 16, reuseSrc = false)
      q63(s"q63 shm b16   rep$r", "/dev/shm", 16, reuseSrc = true)
      q63(s"q63 shm b8    rep$r", "/dev/shm", 8, reuseSrc = true)
      q63(s"q63 shm b4    rep$r", "/dev/shm", 4, reuseSrc = true)
    }
    outer.stop()
  }
}
