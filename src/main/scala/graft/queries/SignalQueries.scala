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
    // = floor(y/2^age) for y ≥ 0; negative measures are clamped to 0 first,
    // since an arithmetic shift of a negative long converges to −1, never
    // 0) — exponential decay with zero floating
    // point, so the ranking is bit-stable across engines and reruns. Age
    // anchors to the corpus max timestamp (1-row broadcast scalar).
    "q125_decay_leaderboard" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), expr("unix_micros(ts)").as("tus"),
          greatest(floor(col("value") * lit(1e6) + lit(0.5)), lit(0))
            .cast("long").as("y"))
      val anchor = ev.agg(max(col("tus")).as("t_max"))
      ev.crossJoin(broadcast(anchor))
        .withColumn("age_w",
          least(expr("(t_max - tus) div 604800000000"), lit(62L)).cast("int"))
        .withColumn("dy", expr("shiftright(y, age_w)"))
        .groupBy(col("user_id"))
        .agg(sum(col("dy")).as("decayed"), count(lit(1)).as("n_events"))
        .where(col("decayed") > 0)
    }),

    // Seasonal-baseline anomaly: each (type, date, hour) bucket vs the
    // integer mean for that (type, hour-of-day) across all dates — the
    // hour's traffic "shape" is the baseline, so a 3am spike flags even
    // when it's smaller than normal 3pm traffic. Flag > 2× or < ½×
    // (integer-ppm thresholds). The bucket grid is DENSIFIED (observed
    // types × observed days × all 24 hours) so a total outage appears as
    // n = 0 and flags — a sparse groupBy would silently miss the most
    // extreme anomaly and bias the baseline upward. Baselines broadcast
    // back (|type×24| rows).
    "q126_seasonal_anomaly" -> ((s, dir) => {
      val b = t(s, dir, "events").select(col("event_type"),
        (year(col("ts")) * 10000 + month(col("ts")) * 100 +
          dayofmonth(col("ts"))).cast("int").as("ymd"),
        hour(col("ts")).cast("int").as("hh"))
      val obs = b.groupBy(col("event_type"), col("ymd"), col("hh"))
        .agg(count(lit(1)).as("n")).localCheckpoint(true)
      val grid = obs.select(col("event_type")).distinct()
        .crossJoin(obs.select(col("ymd")).distinct())
        .withColumn("hh", explode(sequence(lit(0), lit(23))))
        .withColumn("hh", col("hh").cast("int"))
      val buckets = grid.join(obs, Seq("event_type", "ymd", "hh"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
      val baseline = buckets.groupBy(col("event_type"), col("hh"))
        .agg(sum(col("n")).as("tot"), count(lit(1)).as("n_days"))
        .select(col("event_type"), col("hh"),
          expr("tot div n_days").as("expected"))
      buckets.join(broadcast(baseline), Seq("event_type", "hh"))
        .where(col("expected") > 0)
        .withColumn("dev_ppm", expr("(n * 1000000) div expected"))
        .where(col("dev_ppm") > 2000000L || col("dev_ppm") < 500000L)
        .select(col("event_type"), col("ymd"), col("hh"), col("n"),
          col("expected"), col("dev_ppm"))
    }),

    // Multi-field record linkage over q108's blocked candidates: name
    // similarity (bounded edit distance → per-mille), price closeness
    // (relative difference in cents → per-mille), size agreement — fused
    // as (5·name + 3·price + 2·size) div 10 and thresholded ON THE
    // INTEGER, so borderline match decisions can't flip between engines.
    "q127_record_linkage" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val pairs = graft.similarity.StringSim.blockedEditPairs(
        p, "p_partkey", "p_name", Seq("p_brand"), maxLenDiff = 2, maxDist = 5)
      val attrs = p.select(col("p_partkey"), length(col("p_name")).as("len"),
        floor(col("p_retailprice") * lit(100) + lit(0.5)).cast("long").as("pc"),
        col("p_size"))
      pairs
        .join(attrs.select(col("p_partkey").as("a_id"), col("len").as("len_a"),
          col("pc").as("pc_a"), col("p_size").as("sz_a")), "a_id")
        .join(attrs.select(col("p_partkey").as("b_id"), col("len").as("len_b"),
          col("pc").as("pc_b"), col("p_size").as("sz_b")), "b_id")
        .withColumn("name_pm",
          expr("(1000 * (greatest(len_a, len_b) - d)) div greatest(len_a, len_b)"))
        .withColumn("price_pm",
          expr("1000 - least(1000, (abs(pc_a - pc_b) * 1000) div greatest(pc_a, pc_b, 1))"))
        .withColumn("size_pm", when(col("sz_a") === col("sz_b"), 1000L).otherwise(0L))
        .withColumn("score_pm",
          expr("(5 * name_pm + 3 * price_pm + 2 * size_pm) div 10"))
        .where(col("score_pm") >= 800L)
        .select(col("a_id"), col("b_id"), col("name_pm"), col("price_pm"),
          col("size_pm"), col("score_pm"))
    }),

    // Step-to-step funnel conversion in integer ppm over q88's counts —
    // the 4-row funnel table windows in one partition by construction.
    "q128_funnel_rates" -> ((s, dir) => {
      val f = graft.analytics.Behavior.funnel(t(s, dir, "events"),
        Seq("signup", "view", "click", "purchase"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("step_idx"))
      f.withColumn("prev_users", lag(col("users"), 1).over(w))
        .withColumn("conv_ppm",
          when(col("prev_users") > 0,
            expr("(users * 1000000) div prev_users")))
        .select(col("step_idx"), col("step"), col("users"), col("conv_ppm"))
    }),

    // Rapid-repeat burst detector: the same user re-firing the same event
    // type within the hour (double-submit/bot signature). A lag window
    // per (user, type) — one exchange, O(1) state per row — flags the
    // repeat rows; the sessionizer groups, this FLAGS.
    "q129_rapid_repeats" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("tus"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("tus"))
        .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(w))
        .where(col("gap_us").isNotNull && col("gap_us") <= 3600000000L)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("gap_us"))
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

    "q128_funnel_rates" ->
      s"""WITH ${AnalyticsQueries.funnelStepsSql},
        |f AS (
        |  SELECT 1 AS step_idx, 'signup' AS step, (SELECT COUNT(*) FROM s1) AS users
        |  UNION ALL SELECT 2, 'view', (SELECT COUNT(*) FROM s2)
        |  UNION ALL SELECT 3, 'click', (SELECT COUNT(*) FROM s3)
        |  UNION ALL SELECT 4, 'purchase', (SELECT COUNT(*) FROM s4)),
        |r AS (SELECT step_idx, step, users,
        |        lag(users) OVER (ORDER BY step_idx) AS prev_users FROM f)
        |SELECT step_idx, step, users,
        |  CASE WHEN prev_users > 0
        |    THEN CAST((users * 1000000) // prev_users AS BIGINT) END AS conv_ppm
        |FROM r""".stripMargin,

    "q129_rapid_repeats" ->
      """WITH q AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS gap_us
        |  FROM events)
        |SELECT event_id, user_id, event_type, gap_us
        |FROM q WHERE gap_us IS NOT NULL AND gap_us <= 3600000000""".stripMargin,

    "q126_seasonal_anomaly" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS INT) AS ymd,
        |    CAST(hour(ts) AS INT) AS hh
        |  FROM events),
        |obs AS MATERIALIZED (SELECT event_type, ymd, hh, COUNT(*) AS n
        |       FROM b GROUP BY 1, 2, 3),
        |grid AS (
        |  SELECT t.event_type, d.ymd, h.hh
        |  FROM (SELECT DISTINCT event_type FROM obs) t
        |  CROSS JOIN (SELECT DISTINCT ymd FROM obs) d
        |  CROSS JOIN (SELECT CAST(unnest(range(0, 24)) AS INT) AS hh) h),
        |buckets AS MATERIALIZED (
        |  SELECT g.event_type, g.ymd, g.hh, COALESCE(o.n, 0) AS n
        |  FROM grid g LEFT JOIN obs o USING (event_type, ymd, hh)),
        |base AS (
        |  SELECT event_type, hh,
        |    CAST(CAST(SUM(n) AS HUGEINT) // COUNT(*) AS BIGINT) AS expected
        |  FROM buckets GROUP BY 1, 2)
        |SELECT k.event_type, k.ymd, k.hh, CAST(k.n AS BIGINT) AS n,
        |  base.expected,
        |  CAST((k.n * 1000000) // base.expected AS BIGINT) AS dev_ppm
        |FROM buckets k JOIN base USING (event_type, hh)
        |WHERE base.expected > 0
        |  AND ((k.n * 1000000) // base.expected > 2000000
        |       OR (k.n * 1000000) // base.expected < 500000)""".stripMargin,

    "q127_record_linkage" ->
      """WITH pairs AS MATERIALIZED (
        |  SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
        |    levenshtein(a.p_name, b.p_name) AS d
        |  FROM part a JOIN part b
        |    ON a.p_brand = b.p_brand
        |   AND split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
        |   AND a.p_partkey < b.p_partkey
        |   AND ABS(length(a.p_name) - length(b.p_name)) <= 2
        |  WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 5),
        |attrs AS (
        |  SELECT p_partkey, length(p_name) AS len,
        |    CAST(FLOOR(p_retailprice * 100.0 + 0.5) AS BIGINT) AS pc, p_size
        |  FROM part),
        |sc AS (
        |  SELECT a_id, b_id,
        |    (1000 * (GREATEST(x.len, y.len) - d)) // GREATEST(x.len, y.len)
        |      AS name_pm,
        |    1000 - LEAST(1000,
        |      (ABS(x.pc - y.pc) * 1000) // GREATEST(x.pc, y.pc, 1)) AS price_pm,
        |    CASE WHEN x.p_size = y.p_size THEN 1000 ELSE 0 END AS size_pm
        |  FROM pairs JOIN attrs x ON x.p_partkey = a_id
        |  JOIN attrs y ON y.p_partkey = b_id)
        |SELECT a_id, b_id, CAST(name_pm AS BIGINT) AS name_pm,
        |  CAST(price_pm AS BIGINT) AS price_pm,
        |  CAST(size_pm AS BIGINT) AS size_pm,
        |  CAST((5 * name_pm + 3 * price_pm + 2 * size_pm) // 10 AS BIGINT)
        |    AS score_pm
        |FROM sc
        |WHERE (5 * name_pm + 3 * price_pm + 2 * size_pm) // 10 >= 800""".stripMargin,

    "q125_decay_leaderboard" ->
      """WITH q AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |    GREATEST(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT), 0) AS y
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
        |        CAST(run - LEAST(MIN(run) OVER (PARTITION BY event_type
        |          ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING), 0) AS BIGINT)
        |          AS cusum
        |      FROM s)
        |SELECT event_id, event_type, cusum FROM c
        |WHERE cusum > 500000000""".stripMargin
  )
}
