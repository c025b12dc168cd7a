package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("asofJoin picks latest at-or-before right row per key, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // key 10: two right rows before ts 100
      (2L, 10L, 15L),  // key 10: exactly at right ts 15 -> matches it
      (3L, 10L, 5L),   // key 10: before any right row -> null
      (4L, 20L, 50L)   // key 20: no right rows at all -> null
    ).toDF("event_id", "key", "ts")
    val right = Seq(
      (10L, 15L, "v15"),
      (10L, 40L, "v40"),
      (30L, 1L, "other")
    ).toDF("rkey", "rts", "payload")

    val got = rows(AsOfJoin.asofJoin(left, right,
        Seq("key"), Seq("rkey"), "ts", "rts", Seq("payload")))
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("payload")))
      .toMap
    assert(got == Map(1L -> Some("v40"), 2L -> Some("v15"),
      3L -> None, 4L -> None))
  }

  test("latestPerKeyTs keeps the max-tiebreak row per (key, ts)") {
    import spark.implicits._
    val df = Seq((1L, 5L, 7L), (1L, 5L, 9L), (1L, 6L, 1L))
      .toDF("k", "t", "tb")
    val got = rows(AsOfJoin.latestPerKeyTs(df, Seq("k"), "t", "tb"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got == Seq((1L, 5L, 9L), (1L, 6L, 1L)))
  }
}
