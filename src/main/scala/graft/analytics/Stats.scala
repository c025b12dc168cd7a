package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped statistical estimators kept EXACT across engines: ordinary
  * least squares + Pearson correlation, z-score outlier flagging, and
  * ntile-bucket summaries. The built-ins (`regr_slope`, `corr`, `stddev`)
  * stream doubles and are summation-order-dependent — unusable under a
  * cross-engine hash gate and irreproducible across cluster runs. Here
  * every moment is accumulated in exact integer/decimal arithmetic
  * (order-free), and doubles appear only in a fixed, final expression over
  * those exact sums, quantized once with floor(x·scale + 0.5) — floor of
  * identical doubles is bit-deterministic where ROUND(double, n) is not.
  *
  * Scale shape: one map-side-combine hash-agg per group (moments), a
  * broadcast join back for per-row scoring — corpus-linear, no windows over
  * the fact table.
  */
object Stats {

  private def d38(c: Column): Column = c.cast("decimal(38,0)")

  /** Per-group OLS fit of yq on xq plus Pearson r, where `xq`/`yq` are
    * ALREADY-QUANTIZED integer columns (e.g. hours, micro-units — the
    * caller owns the quantization so the oracle can restate it).
    *
    * Emits (group..., n, slope_micro, intercept_micro, corr_micro):
    * slope/intercept in millionths of (y-unit per x-unit) / y-units.
    * The Σx, Σy, Σxy, Σx², Σy² moments are exact (per-row products stay in
    * BIGINT range for quantizations up to ~1e9; sums go through
    * DECIMAL(38,0) = DuckDB's HUGEINT); the closed-form slope
    * (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) is evaluated in doubles only at the end. */
  def linearFit(df: DataFrame, groupCols: Seq[String],
                xq: Column, yq: Column): DataFrame = {
    val moments = df
      .select(groupCols.map(col) :+ xq.cast("long").as("x") :+ yq.cast("long").as("y"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
        sum(d38(col("x") * col("x"))).as("sxx"),
        sum(d38(col("x") * col("y"))).as("sxy"),
        sum(d38(col("y") * col("y"))).as("syy"))
    moments.select(
      moments.columns.filterNot(
        Set("sx", "sy", "sxx", "sxy", "syy").contains).map(col) ++ Seq(
        floor(slopeD * lit(1e6) + lit(0.5)).cast("long").as("slope_micro"),
        floor(interceptD * lit(1e6) + lit(0.5)).cast("long").as("intercept_micro"),
        floor(corrD * lit(1e6) + lit(0.5)).cast("long").as("corr_micro")): _*)
  }

  // Closed-form pieces over the exact moments; doubles enter only here and
  // every operation is IEEE-defined on identical inputs, so both engines
  // produce bit-identical values to feed the single floor-quantization.
  private def dd(c: Column): Column = c.cast("double")
  private def num: Column = dd(d38(col("n")) * col("sxy") - col("sx") * col("sy"))
  private def denX: Column = dd(d38(col("n")) * col("sxx") - col("sx") * col("sx"))
  private def denY: Column = dd(d38(col("n")) * col("syy") - col("sy") * col("sy"))
  // try_divide (NULL on a zero divisor) is the ORACLE's semantics: a
  // single-row or constant-x group has denX = 0, where DuckDB's division
  // yields NULL and the floor-quantization propagates it — ANSI Spark's
  // bare `/` would instead abort the whole job on one degenerate group.
  // Nonzero divisors are bit-identical IEEE division either way.
  private def slopeD: Column = try_divide(num, denX)
  private def interceptD: Column = (dd(col("sy")) - slopeD * dd(col("sx"))) / dd(col("n"))
  private def corrD: Column = try_divide(num, sqrt(denX) * sqrt(denY))

  /** Rows whose |z-score| within their group exceeds `thresholdBp/1e4`
    * standard deviations (sample stddev). z is quantized to integer basis
    * points and THRESHOLDED ON THE INTEGER — a float threshold at the
    * filter boundary would let a last-ulp difference flip row membership.
    * `yq` must be an integer-quantized measure. Group stats ride a
    * broadcast join back onto the rows (|groups| ≪ |rows|). */
  def zscoreOutliers(df: DataFrame, groupCol: String, yq: Column,
                     keepCols: Seq[String], thresholdBp: Long): DataFrame = {
    val q = df.select((groupCol +: keepCols).map(col) :+ yq.cast("long").as("y"): _*)
    val stats = q.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(d38(col("y"))).as("sy"),
        sum(d38(col("y") * col("y"))).as("syy"))
    val meanD = dd(col("sy")) / dd(col("n"))
    // Same oracle-defined edge rule as linearFit: n = 1 zeroes the sample-
    // variance divisor and a constant group zeroes the variance itself —
    // DuckDB's division yields NULL there, so the z (and the WHERE on it)
    // drops the group's rows; ANSI's bare `/` would abort the job instead.
    val varD = try_divide(dd(d38(col("n")) * col("syy") - col("sy") * col("sy")),
      dd(d38(col("n")) * (col("n") - lit(1))))
    val zD = try_divide(dd(col("y")) - meanD, sqrt(varD))
    q.join(broadcast(stats), groupCol)
      .withColumn("z_bp", floor(zD * lit(1e4) + lit(0.5)).cast("long"))
      .where(abs(col("z_bp")) > lit(thresholdBp))
      .select((groupCol +: keepCols).map(col) :+ col("z_bp"): _*)
  }

  /** Benford first-digit profile of a positive integer-quantized measure —
    * the classic fabricated-data screen. The leading digit comes from the
    * decimal string of the integer (identical across engines, where
    * float log10-of-value is not), observed shares are integer ppm, and
    * the expected Benford shares are a 9-row constant table
    * (floor(log10(1+1/d)·1e6 + 0.5), precomputed so no runtime libm call
    * can differ by an ulp across engines). One hash-agg over the digits +
    * a 1-row total broadcast. */
  def benford(df: DataFrame, yq: Column): DataFrame = {
    val expected: Column = element_at(
      map(Seq(301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153,
        45757).zipWithIndex.flatMap { case (ppm, i) =>
        Seq(lit(i + 1), lit(ppm.toLong))
      }: _*), col("digit"))
    val digits = df
      .select(yq.cast("long").as("y")).where(col("y") > 0)
      .select(substring(col("y").cast("string"), 1, 1).cast("int").as("digit"))
    // total via a global window over the ≤9-row aggregate — one pass over
    // the data, no second scan for the denominator
    digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("n_tot", sum(col("n")).over(Window.partitionBy()))
      .select(col("digit"), col("n"),
        expr("(n * 1000000) div n_tot").as("observed_ppm"),
        expected.as("expected_ppm"))
  }

  /** ntile(`buckets`) summary over a ranked measure: bucket membership is
    * decided by a TOTAL order (`orderCols` must end in a unique key) so the
    * assignment — and therefore every downstream aggregate — is
    * deterministic under ties. The rank comes from
    * [[graft.operators.Ranked.rowNumberRanged]] (range-partitioned global
    * row number — no single-task global-sort window, which buffered every
    * entity on one core) and the tile is reconstructed exactly from
    * (row number, entity count) via [[graft.operators.Ranked
    * .ntileFromRowNumber]]; parity with the plain `ntile().over` window is
    * spec-gated. */
  def ntileSummary(entities: DataFrame, measure: Column, buckets: Int,
                   orderCols: Seq[Column]): DataFrame = {
    import graft.operators.Ranked
    val ranked = Ranked.rowNumberRanged(entities, Nil, orderCols, "_nt_rn")
    // entity count = max row number OVER THE RANKED ARM: an
    // entities.agg(count) arm would share no exchange with the ranged
    // arm (plain partial-count vs RangePartitioning), re-deriving a
    // possibly-expensive `entities` plan from scratch; the max-rn arm's
    // subtree contains the ranged arm's exchanges, so AQE reuses them.
    val n = ranked.agg(max(col("_nt_rn")).as("_nt_n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("bucket",
        Ranked.ntileFromRowNumber(col("_nt_rn"), col("_nt_n"), buckets))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(measure).cast("double").as("total"),
        min(measure).cast("double").as("lo"),
        max(measure).cast("double").as("hi"))
  }
}
