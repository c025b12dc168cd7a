package graft.quality

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {

  test("profile: one row per column, exact null/distinct/min/max") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, None, Some(1.25)),
      (3L, Some("b"), None),
      (3L, Some("a"), Some(9.0))
    ).toDF("id", "tag", "score")
    val got = rows(Profiler.profile(df, Seq("id", "tag", "score")))
      .map(r => r.getAs[String]("col_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nonnull"),
          r.getAs[Long]("n_distinct"), r.getAs[String]("min_val"),
          r.getAs[String]("max_val"))).toMap
    assert(got("id") == ((4L, 4L, 3L, "1.000000", "3.000000")))
    assert(got("tag") == ((4L, 3L, 2L, "a", "b")))
    assert(got("score") == ((4L, 3L, 3L, "1.250000", "9.000000")))
  }

  test("profile survives values past the decimal(28,6) range (ANSI would throw)") {
    import spark.implicits._
    // |v| >= 1e22 overflows the fixed-scale canon cast: under ANSI that
    // killed the whole profile job; non-ANSI silently nulled min/max of a
    // fully-populated column. Out-of-range values fall back to the plain
    // double rendering.
    val df = Seq(1e23, -1e23, 2.5).toDF("v")
    val got = rows(Profiler.profile(df, Seq("v"))).head
    assert(got.getAs[Long]("n_nonnull") == 3L)
    // the double literal 1e23's shortest decimal rendering (Java toString)
    assert(got.getAs[String]("min_val") == "-9.999999999999999E22")
    assert(got.getAs[String]("max_val") == "9.999999999999999E22")
  }

  test("profile stays total on unorderable (map) columns") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // count_distinct/min/max reject MapType; the profiler must profile
    // what it can (n_nonnull) and NULL the rest — not abort every column.
    val df = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2)))
      .toDF("id", "m")
    val got = Profiler.profile(df, Seq("id", "m")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(got("id").getAs[Long]("n_distinct") == 2L)
    val m = got("m")
    assert(m.getAs[Long]("n_nonnull") == 2L)
    assert(m.isNullAt(m.fieldIndex("n_distinct")) &&
      m.isNullAt(m.fieldIndex("min_val")) && m.isNullAt(m.fieldIndex("max_val")))
  }

  test("profile is a single-scan plan (no per-column unions)") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
    val plan = Profiler.profile(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), "profile must not union per-column scans")
  }

  test("profile accepts column names that are not bare SQL identifiers") {
    import spark.implicits._
    // Legal DataFrame/parquet names; the old name-spliced selectExpr threw
    // AnalysisException on the dash (parsed as subtraction) and the quote.
    val df = Seq((1L, "x", 0.5), (2L, "y", 1.5))
      .toDF("order-date", "it's", "a\\nb")
    val got = rows(Profiler.profile(df, Seq("order-date", "it's", "a\\nb")))
      .map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_nonnull")).toMap
    // "a\nb" (literal backslash-n) round-trips exactly: name literals
    // used to pass through SQL escape processing and became a newline.
    assert(got == Map("order-date" -> 2L, "it's" -> 2L, "a\\nb" -> 2L))
  }
}
