package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** Kafka log/event sink (SURVEY.md §2.1 S15) — the reference's
  * `KafkaProducer` logging handler (reference:
  * src/com/vitthalmirji/kafka/Logger.py:34-50, which JSON-serializes each
  * log record as `{"message": ...}` and sends it to a topic) re-expressed
  * Spark-first: instead of a per-record driver-side producer, the DataFrame
  * itself is shaped into Kafka's sink contract and written by the `kafka`
  * source — distributed, batched, and (in streaming) checkpointed
  * exactly-once-per-micro-batch.
  *
  * Kafka's Spark sink contract: a `value` column (string/binary), optional
  * `key` (partition affinity) and `headers`. [[records]] builds that frame
  * (pure column algebra — fully testable offline); [[writer]] /
  * [[streamWriter]] attach format and options. The only step this sandbox
  * cannot exercise is `save()`/`start()` — the `spark-sql-kafka` connector
  * jar and a broker are deployment-time dependencies (zero-egress env);
  * everything up to that line is real and spec-covered (KafkaLogSpec).
  *
  * Boundary verified final (rounds 6-7): `/opt/spark/jars` ships NO kafka
  * artifact at all — no `spark-sql-kafka`, no `kafka-clients` — and a
  * full-filesystem search (round 7) finds no kafka jar anywhere: the
  * offline coursier cache holds only sbt/scala toolchain artifacts plus
  * scalatest/scalacheck/duckdb-jdbc, so neither an embedded KRaft broker
  * nor even the client classes can be compiled here, and the zero-egress
  * network forbids fetching them. CLOSED AS ENVIRONMENTAL BOUNDARY: the
  * connector seam (`writer(...).save()` / `streamWriter(...).start()`) is
  * where a connector-equipped deployment takes over; everything up to it
  * — record shaping, writer/stream-writer configuration, trigger and
  * checkpoint wiring — is real code under KafkaLogSpec.
  */
object KafkaLog {

  /** Shape (key, message) rows into Kafka's sink schema. The value is the
    * reference's wire format: `{"message": <formatted>}` JSON. A null
    * `keyCol` omits the key (round-robin partition assignment). */
  def records(df: DataFrame, messageCol: String,
              keyCol: Option[String] = None): DataFrame = {
    // ignoreNullFields=false: a null message must serialize as
    // {"message": null}, not {} — consumers of the reference handler index
    // the "message" key unconditionally
    val value = to_json(struct(col(messageCol).as("message")),
      java.util.Map.of("ignoreNullFields", "false")).as("value")
    keyCol match {
      case Some(k) => df.select(col(k).cast("string").as("key"), value)
      case None    => df.select(value)
    }
  }

  /** Configured BATCH Kafka writer — caller invokes `.save()` where the
    * connector jar and broker exist. */
  def writer(records: DataFrame, bootstrapServers: String, topic: String,
             extraOptions: Map[String, String] = Map.empty): DataFrameWriter[Row] =
    records.write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .options(extraOptions)

  /** Configured STREAMING Kafka writer — checkpointed micro-batch publish,
    * the streaming twin of the reference's handler. Caller invokes
    * `.start()` in a connector-equipped deployment. */
  def streamWriter(records: DataFrame, bootstrapServers: String, topic: String,
                   checkpointDir: String,
                   trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : DataStreamWriter[Row] =
    records.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
}
