package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("assignSessions splits per-key streams at the idle gap") {
    import spark.implicits._
    // user 1: events at 0, 10, 20 min (one session), then 60, 65 (second);
    // user 2: single event
    val events = Seq(
      (1L, ts(0), 101L), (1L, ts(10), 102L), (1L, ts(20), 103L),
      (1L, ts(60), 104L), (1L, ts(65), 105L),
      (2L, ts(5), 201L)
    ).toDF("user_id", "ts", "event_id")
    val got = rows(Sessionize.assignSessions(events, "user_id", "ts",
        "event_id", gapSec = 30 * 60))
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("session_seq")))
      .toMap
    assert(got == Map(101L -> 1L, 102L -> 1L, 103L -> 1L,
      104L -> 2L, 105L -> 2L, 201L -> 1L))
  }

  test("sessionStats aggregates µs-exact spans and decimal sums") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0), 1L, 1.10), (1L, ts(10), 2L, 2.20),
      (1L, ts(90), 3L, 0.70)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = rows(Sessionize.sessionStats(events, "user_id", "ts",
        "event_id", gapSec = 1800, valueCol = col("value")))
      .map(r => (r.getAs[Long]("session_seq"),
        (r.getAs[Long]("n_events"), r.getAs[Long]("span_us"),
          r.getAs[Double]("sum_value")))).toMap
    assert(got(1L) == ((2L, 600000000L, 3.30)))
    assert(got(2L) == ((1L, 0L, 0.70)))
  }

  test("manual gaps-and-islands agrees with Spark's native session_window") {
    val events = graft.core.Tables.load(spark, sf, "events")
    val manual = Sessionize.sessionStats(events, "user_id", "ts", "event_id",
      gapSec = 1800, valueCol = col("value"))
    val native = events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    // strict-> vs >= gap boundary semantics can only differ on exact-gap
    // timestamps; with none present the session partitions must be equal
    assert(manual.count() == native.count())
    val manualSizes = rows(manual.groupBy(col("n_events")).count())
      .map(r => r.getAs[Long]("n_events") -> r.getAs[Long]("count")).toMap
    val nativeSizes = rows(native.groupBy(col("n_events")).count())
      .map(r => r.getAs[Long]("n_events") -> r.getAs[Long]("count")).toMap
    assert(manualSizes == nativeSizes)
  }

  test("equal timestamps fall in one session regardless of tie order") {
    import spark.implicits._
    val events = Seq((1L, ts(0), 2L), (1L, ts(0), 1L)).toDF("user_id", "ts", "event_id")
    val got = rows(Sessionize.assignSessions(events, "user_id", "ts", "event_id", 60))
      .map(_.getAs[Long]("session_seq")).distinct
    assert(got == Seq(1L))
  }
}
