package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.SparkSpec

/** S15 coverage to the offline boundary: record shaping (the wire format)
  * and writer configuration are asserted; only `save()`/`start()` — which
  * need the kafka connector jar + a broker — are deployment-time. */
class KafkaLogSpec extends SparkSpec {

  test("records builds Kafka's sink schema with the reference wire format") {
    import spark.implicits._
    val logs = Seq(("job-1", "step ok"), ("job-2", "step failed"))
      .toDF("job", "msg")
    val keyed = KafkaLog.records(logs, "msg", keyCol = Some("job"))
    assert(keyed.schema == StructType(Seq(
      StructField("key", StringType), StructField("value", StringType, nullable = true))))
    // value is the reference handler's JSON format: {"message": <msg>}
    val parsed = rows(keyed.select(col("key"),
      get_json_object(col("value"), "$.message").as("m")))
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(parsed == Map("job-1" -> "step ok", "job-2" -> "step failed"))
    // keyless shape: value-only (round-robin partitioning)
    assert(KafkaLog.records(logs, "msg").columns.toSeq == Seq("value"))
    // null messages keep the key in the wire format: {"message": null}
    val withNull = Seq((Some("x"), None: Option[String])).toDF("job", "msg")
    val v = rows(KafkaLog.records(withNull, "msg")).head.getString(0)
    assert(v == """{"message":null}""", s"got $v")
  }

  test("batch and streaming writers configure the kafka sink without starting") {
    import spark.implicits._
    val recs = KafkaLog.records(
      Seq(("a", "x")).toDF("job", "msg"), "msg", Some("job"))
    // construction must not resolve the connector or contact a broker
    val w = KafkaLog.writer(recs, "broker-1:9092,broker-2:9092", "graft-logs",
      Map("kafka.compression.type" -> "lz4"))
    assert(w != null)
    val stream = spark.readStream.format("rate").load()
      .select(col("value").cast("string").as("msg"))
    val sw = KafkaLog.streamWriter(KafkaLog.records(stream, "msg"),
      "broker-1:9092", "graft-logs", "/tmp/ck")
    assert(sw != null)
  }
}
