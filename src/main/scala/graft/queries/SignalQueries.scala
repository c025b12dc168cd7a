package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Signal
import graft.core.Tables
import graft.similarity.StringSim

/** Round-5 continuation pack: robust statistics and temporal-signal
  * operators (median/MAD outliers, sweep-line interval concurrency, exact
  * rolling median, CUSUM change detection) plus a blocked edit-distance
  * similarity join — each a classically sequential or quadratic algorithm
  * re-expressed as distributed window algebra / blocked equi-joins, and
  * each hash-gated against an independent DuckDB restatement.
  *
  * Exactness discipline (MEMORY: oracle-exactness-rules): measures are
  * integer-quantized at entry (floor(x·scale + 0.5)); medians of integers
  * are dyadic rationals, exact in doubles; every filter thresholds an
  * integer; timestamps compare in epoch seconds/µs.
  */
object SignalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Robust per-type outliers: |y − median| > 1.3 × 1.4826·MAD. Unlike
    // q95's mean/σ z-score, median/MAD doesn't let the outliers inflate
    // their own yardstick. Exact medians (the gate demands them); stats
    // ride broadcast joins; threshold on integer basis points.
    "q106_mad_outliers" -> ((s, dir) =>
      Signal.madOutliers(t(s, dir, "events"), "event_type",
        floor(col("value") * lit(1e6) + lit(0.5)),
        Seq("event_id"), thresholdBp = 13000L)
        .select(col("event_id"), col("event_type"), col("rz_bp"))),

    // Peak concurrent intervals per event type — sweep-line as window
    // algebra. Intervals are [t, t + dur) with dur derived from the
    // integer-quantized value (abs(y‰) % 3600 + 60 seconds), so both
    // engines construct identical intervals from the raw table.
    "q107_peak_concurrency" -> ((s, dir) => {
      val y = floor(col("value") * lit(1000) + lit(0.5)).cast("long")
      val start = expr("unix_micros(ts) div 1000000")
      Signal.peakConcurrency(
        t(s, dir, "events")
          .withColumn("t0", start)
          .withColumn("t1", start + abs(y) % lit(3600L) + lit(60L)),
        "event_type", col("t0"), col("t1"), col("event_id"))
        .select(col("event_type"), col("peak").cast("long").as("peak"),
          col("t_at_peak"))
    }),

    // Blocked edit-distance near-dup pairs on part names: same brand, same
    // first token, length within ±2, 1 ≤ levenshtein ≤ 5 via the banded
    // threshold DP. Candidate cost is Σ block², never n².
    "q108_name_edit_pairs" -> ((s, dir) =>
      StringSim.blockedEditPairs(t(s, dir, "part"), "p_partkey", "p_name",
        Seq("p_brand"), maxLenDiff = 2, maxDist = 5)),

    // Exact rolling median over the trailing 7 observations per type — a
    // bounded-frame order statistic: collect_list over the row frame keeps
    // O(7) values per row, interpolating the two middles on even counts
    // (lower + (upper−lower)·0.5, exact in doubles for integer inputs).
    "q109_rolling_median" -> ((s, dir) =>
      Signal.rollingMedian(
        t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("ts"),
            floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("y")),
        "event_type", Seq(col("ts"), col("event_id")), col("y"),
        width = 7, medCol = "med7")
        .select(col("event_id"), col("event_type"), col("y"), col("med7"))),

    // CUSUM drift alarms per type via the prefix-sum identity
    // C_t = S_t − min_{j≤t} S_j: the sequential recursion becomes a
    // cumulative sum plus a running min — two pipelined window passes over
    // one exchange. target = per-type integer mean, slack = target/20,
    // alarm when the accumulated positive drift exceeds 500 value-µ-units.
    "q110_cusum_drift" -> ((s, dir) =>
      Signal.cusum(t(s, dir, "events"), "event_type",
        Seq(col("ts"), col("event_id")),
        floor(col("value") * lit(1e6) + lit(0.5)),
        slackDiv = 20L, threshold = 500000000L, keepCols = Seq("event_id"))
        .select(col("event_id"), col("event_type"), col("cusum"))),

    // Time-decayed leaderboard per user: weight halves every week of age,
    // implemented as a RIGHT SHIFT of the integer measure (y >> age_weeks
    // = floor(y/2^age) for y ≥ 0) — exponential decay with zero floating
    // point, so the ranking is bit-stable across engines and reruns. Age
    // anchors to the corpus max timestamp (1-row broadcast scalar).
    "q125_decay_leaderboard" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), expr("unix_micros(ts)").as("tus"),
          floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("y"))
      val anchor = ev.agg(max(col("tus")).as("t_max"))
      ev.crossJoin(broadcast(anchor))
        .withColumn("age_w",
          least(expr("(t_max - tus) div 604800000000"), lit(62L)).cast("int"))
        .withColumn("dy", expr("shiftright(y, age_w)"))
        .groupBy(col("user_id"))
        .agg(sum(col("dy")).as("decayed"), count(lit(1)).as("n_events"))
        .where(col("decayed") > 0)
    })
  )

  val oracles: Map[String, String] = Map(

    "q106_mad_outliers" ->
      """WITH q AS (SELECT event_id, event_type,
        |    CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS y FROM events),
        |m AS (SELECT event_type, median(y) AS med FROM q GROUP BY 1),
        |d AS (SELECT q.event_type, ABS(CAST(y AS DOUBLE) - med) AS adev
        |      FROM q JOIN m USING (event_type)),
        |md AS (SELECT event_type, median(adev) AS mad FROM d GROUP BY 1)
        |SELECT event_id, q.event_type,
        |  CAST(FLOOR((CAST(y AS DOUBLE) - med) / (mad * 1.4826)
        |    * 10000.0 + 0.5) AS BIGINT) AS rz_bp
        |FROM q JOIN m USING (event_type) JOIN md USING (event_type)
        |WHERE mad > 0
        |  AND ABS(CAST(FLOOR((CAST(y AS DOUBLE) - med) / (mad * 1.4826)
        |    * 10000.0 + 0.5) AS BIGINT)) > 13000""".stripMargin,

    "q107_peak_concurrency" ->
      """WITH iv AS (
        |  SELECT event_id, event_type,
        |    epoch_us(ts) // 1000000 AS t0,
        |    epoch_us(ts) // 1000000
        |      + (ABS(CAST(FLOOR(value * 1000.0 + 0.5) AS BIGINT)) % 3600)
        |      + 60 AS t1
        |  FROM events),
        |pts AS (
        |  SELECT event_type, t0 AS t, 1 AS delta, event_id FROM iv
        |  UNION ALL
        |  SELECT event_type, t1, -1, event_id FROM iv),
        |c AS (
        |  SELECT event_type, t,
        |    SUM(delta) OVER (PARTITION BY event_type
        |      ORDER BY t, delta, event_id ROWS UNBOUNDED PRECEDING) AS conc
        |  FROM pts),
        |p AS (SELECT event_type, MAX(conc) AS peak FROM c GROUP BY 1)
        |SELECT c.event_type, CAST(p.peak AS BIGINT) AS peak,
        |  MIN(c.t) AS t_at_peak
        |FROM c JOIN p ON c.event_type = p.event_type AND c.conc = p.peak
        |GROUP BY 1, 2""".stripMargin,

    "q108_name_edit_pairs" ->
      """SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS d
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand
        | AND split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
        | AND a.p_partkey < b.p_partkey
        | AND ABS(length(a.p_name) - length(b.p_name)) <= 2
        |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 5""".stripMargin,

    "q109_rolling_median" ->
      """SELECT event_id, event_type, y,
        |  median(y) OVER (PARTITION BY event_type
        |    ORDER BY tus, event_id
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
        |FROM (SELECT event_id, event_type, epoch_us(ts) AS tus,
        |        CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS y
        |      FROM events)""".stripMargin,

    "q125_decay_leaderboard" ->
      """WITH q AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |    CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS y
        |  FROM events),
        |a AS (SELECT MAX(tus) AS t_max FROM q),
        |d AS (
        |  SELECT user_id,
        |    y >> LEAST((t_max - tus) // 604800000000, 62) AS dy
        |  FROM q CROSS JOIN a)
        |SELECT user_id, CAST(SUM(dy) AS BIGINT) AS decayed,
        |  COUNT(*) AS n_events
        |FROM d GROUP BY 1 HAVING SUM(dy) > 0""".stripMargin,

    "q110_cusum_drift" ->
      """WITH q AS (SELECT event_id, event_type, epoch_us(ts) AS tus,
        |    CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS y FROM events),
        |m AS (SELECT event_type,
        |        CAST(CAST(SUM(y) AS HUGEINT) // COUNT(*) AS BIGINT) AS target
        |      FROM q GROUP BY 1),
        |s AS (SELECT event_id, q.event_type, tus, y,
        |        SUM(y - target - target // 20) OVER (PARTITION BY q.event_type
        |          ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS run
        |      FROM q JOIN m USING (event_type)),
        |c AS (SELECT event_id, event_type,
        |        CAST(run - MIN(run) OVER (PARTITION BY event_type
        |          ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |          AS cusum
        |      FROM s)
        |SELECT event_id, event_type, cusum FROM c
        |WHERE cusum > 500000000""".stripMargin
  )
}
