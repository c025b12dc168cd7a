package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.multimodal.Multimodal
import graft.streaming.Streams

/** Streaming and multimodal surfaces pushed through the driver gate.
  *
  * q42 runs the SAME tumbling-window aggregation as batch q18 — but as a
  * Structured Streaming query (file source → watermark → windowed agg →
  * memory sink, AvailableNow trigger) — and must hash-match q18's DuckDB
  * oracle: direct evidence that the batch and streaming paths share
  * semantics. q43 exercises the multimodal decode plumbing end-to-end
  * (deterministic stub codecs — no SQL oracle; the driver records the
  * rows-only check).
  */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.10: streaming twin of q18. The file source needs a directory, so
    // the single-file events table is staged into a scratch dir (at scale
    // this IS the layout: a landing dir accruing files per micro-batch).
    "q42_stream_tumbling" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_q42")
      Files.copy(Paths.get(s"$dir/events.parquet"), tmp.resolve("events.parquet"))
      val events = s.readStream
        .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
          "event_type STRING, value DOUBLE, props STRING")
        .parquet(tmp.toString)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      val agg = events
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("window_epoch"),
          col("event_type"), col("n_events"), col("sum_value"))
      val name = "q42_mem_" + java.util.UUID.randomUUID.toString.replace("-", "")
      Streams.runToMemory(s, agg, name, OutputMode.Complete())
    }),

    // Multimodal decode plumbing: documents' text bytes stand in for media
    // payloads; schema/batching/feature-contract are the real thing, the
    // codec is the documented deterministic stub.
    "q43_multimodal_decode" -> ((s, dir) => {
      import s.implicits._
      val records = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
        .map { r =>
          val bytes = r.getAs[String]("text").getBytes("UTF-8")
          Multimodal.MediaRecord(
            r.getAs[Long]("doc_id"),
            Multimodal.MediaMeta("image/fake", s"doc://${r.getAs[Long]("doc_id")}",
              bytes.length.toLong),
            bytes)
        }
      Multimodal.decodeImages(records, featureDim = 16)
        .select(col("media_id"), col("width"), col("height"), col("channels"),
          size(col("features")).as("feature_dim"))
    })
  )

  /** q42 shares q18's oracle (same semantics, streaming execution);
    * q43 has no SQL-expressible oracle (stub codec) — rows-only check. */
  val oracles: Map[String, String] = Map(
    "q42_stream_tumbling" ->
      """SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_epoch, event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin
  )
}
