package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("pointInInterval refuses reserved/ambiguous column collisions") {
    import spark.implicits._
    val pts = Seq((1L, ts("2024-01-01 00:30:00"), "x"))
      .toDF("k", "t", "__bucket")
    val ivs = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), "A"))
      .toDF("ik", "s", "e", "label")
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, ivs, Seq("k"), Seq("ik"),
        "t", "s", "e", Seq("label"))
    }
    assert(e1.getMessage.contains("__bucket"))
    val pts2 = Seq((1L, ts("2024-01-01 00:30:00"), "mine"))
      .toDF("k", "t", "label")
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts2, ivs, Seq("k"), Seq("ik"),
        "t", "s", "e", Seq("label"))
    }
    assert(e2.getMessage.contains("label"))
  }

  test("pointInInterval matches across bucket boundaries, excludes end") {
    import spark.implicits._
    val points = Seq(
      (1L, 10L, ts("2024-01-01 00:30:00")), // inside iv A
      (2L, 10L, ts("2024-01-01 02:15:00")), // inside iv A (interval spans buckets)
      (3L, 10L, ts("2024-01-01 03:00:00")), // exactly at A's end -> excluded
      (4L, 10L, ts("2024-01-01 00:00:00")), // exactly at A's start -> included
      (5L, 20L, ts("2024-01-01 00:30:00")), // wrong key
      (6L, 10L, ts("2024-01-02 00:00:00"))  // outside
    ).toDF("event_id", "key", "t")
    val intervals = Seq(
      (10L, "A", ts("2024-01-01 00:00:00"), ts("2024-01-01 03:00:00")),
      (10L, "empty", ts("2024-01-01 05:00:00"), ts("2024-01-01 05:00:00"))
    ).toDF("ikey", "iv_id", "start_t", "end_t")

    val got = rows(RangeJoin.pointInInterval(points, intervals,
        Seq("key"), Seq("ikey"), "t", "start_t", "end_t", Seq("iv_id"),
        bucketMicros = 3600L * 1000000L))
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("iv_id"))
      .sorted
    assert(got == Seq(1L -> "A", 2L -> "A", 4L -> "A"))
  }
}
