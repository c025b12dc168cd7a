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

  test("null timestamps never match: right null-ts is filtered, left null-ts yields null") {
    import spark.implicits._
    val left = Seq((1L, 10L, Some(9L)), (2L, 10L, Option.empty[Long]))
      .toDF("event_id", "key", "ts")
    val right = Seq((10L, Option.empty[Long], "poison"), (10L, Some(10L), "v10"))
      .toDF("rkey", "rts", "payload")
    // backward: the null-ts right row used to sort FIRST under asc and
    // attach "poison" to every left row before the first real right row.
    val back = rows(AsOfJoin.asofJoin(left, right,
        Seq("key"), Seq("rkey"), "ts", "rts", Seq("payload")))
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("payload")))
      .toMap
    assert(back == Map(1L -> None, 2L -> None), s"backward: $back")
    // forward: a null-ts LEFT row used to sort LAST under desc and pick
    // up the running last payload.
    val fwd = rows(AsOfJoin.asofJoin(left, right,
        Seq("key"), Seq("rkey"), "ts", "rts", Seq("payload"),
        direction = "forward"))
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("payload")))
      .toMap
    assert(fwd == Map(1L -> Some("v10"), 2L -> None), s"forward: $fwd")
  }

  test("rightCols colliding with left's columns fail fast") {
    import spark.implicits._
    val left = Seq((1L, 10L, 5L)).toDF("event_id", "key", "ts")
    val right = Seq((10L, 1L, "x")).toDF("rkey", "rts", "event_id")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(left, right, Seq("key"), Seq("rkey"), "ts", "rts",
        Seq("event_id"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("forward direction picks earliest at-or-after; tolerance nulls far matches") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 10L), // next right at 15 (gap 5)
      (2L, 10L, 15L), // exactly at 15 -> matches it (gap 0)
      (3L, 10L, 41L), // after all right rows -> null
      (4L, 10L, 16L)  // next right at 40 (gap 24)
    ).toDF("event_id", "key", "ts")
    val right = Seq((10L, 15L, "v15"), (10L, 40L, "v40")).toDF("rkey", "rts", "payload")

    val fwd = rows(AsOfJoin.asofJoin(left, right,
        Seq("key"), Seq("rkey"), "ts", "rts", Seq("payload"),
        direction = "forward"))
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("payload"))).toMap
    assert(fwd == Map(1L -> Some("v15"), 2L -> Some("v15"),
      3L -> None, 4L -> Some("v40")))

    // long ts casts to seconds; tolerance of 10s keeps gaps 5 and 0, nulls 24
    val tol = rows(AsOfJoin.asofJoin(left, right,
        Seq("key"), Seq("rkey"), "ts", "rts", Seq("payload"),
        direction = "forward", toleranceUs = Some(10L * 1000000L)))
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("payload"))).toMap
    assert(tol == Map(1L -> Some("v15"), 2L -> Some("v15"),
      3L -> None, 4L -> None))
  }

  test("backward tolerance nulls matches older than the bound") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 17L)).toDF("event_id", "key", "ts")
    val right = Seq((10L, 15L, "v15"), (10L, 40L, "v40")).toDF("rkey", "rts", "payload")
    val got = rows(AsOfJoin.asofJoin(left, right,
        Seq("key"), Seq("rkey"), "ts", "rts", Seq("payload"),
        toleranceUs = Some(5L * 1000000L)))
      .map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("payload"))).toMap
    // event 1: nearest is v40, 60s back -> nulled; event 2: v15, 2s back -> kept
    assert(got == Map(1L -> None, 2L -> Some("v15")))
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
