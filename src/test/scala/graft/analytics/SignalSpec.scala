package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.StringSim

class SignalSpec extends SparkSpec {
  import spark.implicits._

  test("peakConcurrency sweeps half-open intervals: touching ends don't overlap") {
    // g: [0,10) [5,15) [10,20) → peak 2 (at t=5); the [10,20) start meets
    // the [0,10) end exactly and must NOT count as a third.
    val iv = Seq(("g", 0L, 10L, 1L), ("g", 5L, 15L, 2L), ("g", 10L, 20L, 3L))
      .toDF("k", "t0", "t1", "id")
    val out = Signal.peakConcurrency(iv, "k", col("t0"), col("t1"), col("id"))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("peak") == 2L)
    assert(out.head.getAs[Long]("t_at_peak") == 5L)
  }

  test("peakConcurrency excludes NULL-endpoint intervals instead of corrupting the count") {
    // A NULL end (open session) used to sort its −1 to the head of the
    // window and shift every running count down by one.
    val iv = Seq(
      ("g", Option(0L), Option(10L), 1L),
      ("g", Option(5L), Option(15L), 2L),
      ("g", Option(7L), Option.empty[Long], 3L), // open interval: excluded
      ("g", Option.empty[Long], Option(9L), 4L)) // unknown start: excluded
      .toDF("k", "t0", "t1", "id")
    val out = Signal.peakConcurrency(iv, "k", col("t0"), col("t1"), col("id"))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("peak") == 2L, s"${out.head}")
    assert(out.head.getAs[Long]("t_at_peak") == 5L)
  }

  test("rollingMedian matches a brute-force computation, odd and even frames") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 20L),
      ("a", 4L, 40L), ("b", 1L, 7L)).toDF("k", "o", "y")
    val got = Signal.rollingMedian(df, "k", Seq(col("o")), col("y"),
        width = 3, medCol = "m")
      .orderBy("k", "o").select("k", "o", "m").as[(String, Long, Double)]
      .collect().toSeq
    // a: [10]→10, [10,30]→20, [10,30,20]→20, [30,20,40]→30; b: [7]→7
    assert(got == Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 20.0),
      ("a", 4L, 30.0), ("b", 1L, 7.0)))
  }

  test("rollingMedian: a frame of only NULL measures yields NULL, not a crash") {
    // collect_list skips nulls: a group's first row with null y used to
    // evaluate element_at(arr, 0) and throw INVALID_INDEX_OF_ZERO.
    val df = Seq((1L, 1L, Option.empty[Double]), (1L, 2L, Some(4.0)),
      (1L, 3L, Some(6.0))).toDF("g", "t", "y")
    val got = Signal.rollingMedian(df, "g", Seq(col("t")), col("y"),
        width = 2, medCol = "med")
      .orderBy("t").select("med").collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    assert(got == Seq(null, 4.0, 5.0))
  }

  test("cusum refuses a non-positive slackDiv loudly") {
    val df = Seq((1L, 1L, 10L)).toDF("g", "t", "y")
    val e = intercept[IllegalArgumentException] {
      Signal.cusum(df, "g", Seq(col("t")), col("y"), slackDiv = 0,
        threshold = 1L, keepCols = Seq("t"))
    }
    assert(e.getMessage.contains("slackDiv"))
  }

  test("cusum equals the sequential recursion on a hand-traced series") {
    // y: 10,10,40,40,10 target = 22 (110 div 5), slack = 22 div 20 = 1 →
    // d = y-23: -13,-13,17,17,-13; S: -13,-26,-9,8,-5; minS: -13,-26,-26,-26,-26
    // C = S-minS: 0,0,17,34,21 → threshold 15 keeps ids 3,4,5.
    val df = Seq((1L, 10L), (2L, 10L), (3L, 40L), (4L, 40L), (5L, 10L))
      .map { case (i, y) => ("k", i, y) }.toDF("k", "id", "y")
    val got = Signal.cusum(df, "k", Seq(col("id")), col("y"),
        slackDiv = 20L, threshold = 15L, keepCols = Seq("id"))
      .orderBy("id").select("id", "cusum").as[(Long, Long)].collect().toSeq
    assert(got == Seq((3L, 17L), (4L, 34L), (5L, 21L)))
  }

  test("cusum alarms immediately when the series drifts up from row 1 (S_0 term)") {
    // y: 40,10,10 target = 20 (60 div 3), slack = 1 → d = y-21: 19,-11,-11
    // S: 19,8,-3. Recursion: C_1 = max(0,19) = 19, C_2 = 8, C_3 = 0.
    // Without the S_0 = 0 term the running min is 19 at t=1, so C_1 would
    // be 0 and the first-row alarm is missed.
    val df = Seq((1L, 40L), (2L, 10L), (3L, 10L))
      .map { case (i, y) => ("k", i, y) }.toDF("k", "id", "y")
    val got = Signal.cusum(df, "k", Seq(col("id")), col("y"),
        slackDiv = 20L, threshold = 5L, keepCols = Seq("id"))
      .orderBy("id").select("id", "cusum").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 19L), (2L, 8L)))
  }

  test("madOutliers flags the far point and ignores zero-MAD groups") {
    val df = (Seq.fill(9)(100L) :+ 100L).zipWithIndex
      .map { case (y, i) => ("flat", i.toLong, y) }
      .toDF("k", "id", "y") // MAD 0 → excluded entirely
      .unionAll(Seq(("v", 100L, 10L), ("v", 101L, 11L), ("v", 102L, 12L),
        ("v", 103L, 13L), ("v", 104L, 500L)).toDF("k", "id", "y"))
    val got = Signal.madOutliers(df, "k", col("y"), Seq("id"),
        thresholdBp = 30000L) // |rz| > 3
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(104L))
  }

  test("blockedEditPairs finds in-block near pairs, skips exact dups and far names") {
    val df = Seq(
      (1L, "B1", "red widget"), (2L, "B1", "red widgit"), // d=1 pair
      (3L, "B1", "red widget"),                           // d=0 vs 1 → excluded
      (4L, "B2", "red widget"),                           // other block
      (5L, "B1", "blue widget"),                          // other first token
      (6L, "B1", "red contraption")                       // len diff > 2
    ).toDF("id", "brand", "name")
    val got = StringSim.blockedEditPairs(df, "id", "name", Seq("brand"),
        maxLenDiff = 2, maxDist = 5)
      .select("a_id", "b_id", "d").as[(Long, Long, Int)].collect().toSeq
    assert(got.sorted == Seq((1L, 2L, 1), (2L, 3L, 1)))
  }

  test("blockedEditPairs accepts non-identifier column names") {
    // The first-token expressions used to splice the raw name into
    // expr("split_part(...)"), so a legal name like "product name"
    // threw a ParseException where col(nameCol) accepted it.
    val df = Seq(
      (1L, "B1", "red widget"), (2L, "B1", "red widgit")
    ).toDF("id", "brand", "product name")
    val got = StringSim.blockedEditPairs(df, "id", "product name",
        Seq("brand"), maxLenDiff = 2, maxDist = 5, maxBlockSize = 10)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("blockedEditPairs maxBlockSize drops oversized blocks whole, keeps the rest") {
    // Hot block: one (brand, first-token) key with 5 rows; cool block: 2.
    val hot = (1L to 5L).map(i => (i, "B1", s"red widget$i"))
    val cool = Seq((10L, "B2", "blue thing"), (11L, "B2", "blue thingy"))
    val df = (hot ++ cool).toDF("id", "brand", "name")
    val unguarded = StringSim.blockedEditPairs(df, "id", "name", Seq("brand"),
        maxLenDiff = 2, maxDist = 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    // every hot pair + the cool pair
    assert(unguarded.size == 10 + 1)
    val guarded = StringSim.blockedEditPairs(df, "id", "name", Seq("brand"),
        maxLenDiff = 2, maxDist = 5, maxBlockSize = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    // the 5-row block is dropped WHOLE; pairs outside it are untouched
    assert(guarded == Seq((10L, 11L)))
  }
}
