package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): rows not dominated on a (minimize x,
  * minimize y) objective pair — "no other row is ≤ on both and < on one".
  * The classic formulation is an O(n²) NOT EXISTS self-join; this one is
  * the sort-scan skyline: group to per-x minima, one running-min window
  * over the (small) distinct-x set, then a semi-join back. Cost is one
  * hash-agg over the data + a window over |distinct x| rows + one
  * broadcast-sized join — corpus-linear where the naive shape is
  * quadratic. The DuckDB oracle (q96) restates it as the independent
  * NOT EXISTS algorithm, so the gate also cross-checks the reformulation.
  *
  * Dominance semantics at ties: rows with identical (x, y) dominate
  * neither each other nor get dropped — both survive (no strict
  * inequality holds between them), which both formulations honor.
  */
object Pareto {

  /** Rows of `df` on the (min `xName`, min `yName`) Pareto frontier,
    * original schema preserved. The window runs over one row per distinct
    * x value — if x is near-unique at your scale (continuous price/latency
    * objectives make |distinct x| ≈ |rows|, and an un-partitioned window
    * sorts all of it on ONE task), use [[skyline2dRanged]], which does the
    * same prefix-min scan range-partitioned.
    *
    * NULL objectives: a row with NULL x or y is EXCLUDED, explicitly and
    * in both formulations — a row with an unknown objective cannot be
    * certified non-dominated. (Without the explicit filter the two
    * formulations DISAGREED: the semi-join's null comparison dropped such
    * rows while a bare NOT EXISTS kept them, since every dominance
    * comparison against NULL is NULL.) The oracle carries the matching
    * IS NOT NULL predicates. */
  def skyline2d(df: DataFrame, xName: String, yName: String): DataFrame = {
    val defined = df.where(col(xName).isNotNull && col(yName).isNotNull)
    val perX = defined.groupBy(col(xName)).agg(min(col(yName)).as("_sky_y"))
    val w = Window.orderBy(col(xName)).rowsBetween(Window.unboundedPreceding, -1)
    // x survives iff its best y strictly beats every cheaper x's best y;
    // within a surviving x only the best-y rows survive (same-x rows with
    // larger y are dominated strictly on y).
    val front = perX
      .withColumn("_prev_min", min(col("_sky_y")).over(w))
      .where(col("_prev_min").isNull || col("_sky_y") < col("_prev_min"))
      .select(col(xName).as("_sky_x"), col("_sky_y"))
    defined.join(front,
        defined.col(xName) === col("_sky_x") && defined.col(yName) === col("_sky_y"))
      .select(df.columns.map(defined.col): _*)
  }

  /** [[skyline2d]] for near-unique x at scale: the prefix-min scan runs
    * RANGE-PARTITIONED instead of on one task. The running min over
    * x-order decomposes: within each range partition it is an ordinary
    * partitioned window (parallel), and the carry-in from all earlier
    * ranges is the min over a per-partition summary of `ranges` rows —
    * broadcast back and combined with `least`. RangePartitioner assigns
    * ascending x to ascending partition ids and keeps equal x together,
    * so partition id IS the range order. Same dominance and NULL
    * semantics as [[skyline2d]] (parity spec-gated, including tie rows).
    *
    * Cost: one hash-agg, one range exchange over |distinct x| rows (its
    * shuffle is reused by the summary arm), a partitioned window, and the
    * same join back — no single-task stage anywhere. */
  def skyline2dRanged(df: DataFrame, xName: String, yName: String,
                      ranges: Int = 0): DataFrame = {
    require(ranges >= 0, "ranges must be non-negative (0 = auto)")
    val defined = df.where(col(xName).isNotNull && col(yName).isNotNull)
    // Shared auto-range policy AND the shared reuse-off pin (both from
    // Ranked): this is the same two-arm range decomposition, with the
    // same boundary-consistency requirement — without the pin, a session
    // with spark.sql.exchange.reuse=false would sample DIFFERENT range
    // boundaries for the carry arm and the main arm and silently emit a
    // wrong skyline.
    val perX = Ranked.pinIfNoReuse(
      defined.groupBy(col(xName)).agg(min(col(yName)).as("_sky_y"))
        .repartitionByRange(Ranked.resolveRanges(df, ranges), col(xName))
        .withColumn("_sky_pid", spark_partition_id()))
    // within-range strict-prefix min (parallel: window is partitioned)
    val wIn = Window.partitionBy(col("_sky_pid")).orderBy(col(xName))
      .rowsBetween(Window.unboundedPreceding, -1)
    // carry-in: min over every EARLIER range's per-range min (tiny set)
    val perRange = perX.groupBy(col("_sky_pid")).agg(min(col("_sky_y")).as("_rng_min"))
    val wPrev = Window.orderBy(col("_sky_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = perRange
      .withColumn("_carry_min", min(col("_rng_min")).over(wPrev))
      .select(col("_sky_pid"), col("_carry_min"))
    val front = perX
      .join(broadcast(carry), Seq("_sky_pid"))
      .withColumn("_prev_min",
        least(min(col("_sky_y")).over(wIn), col("_carry_min")))
      .where(col("_prev_min").isNull || col("_sky_y") < col("_prev_min"))
      .select(col(xName).as("_sky_x"), col("_sky_y"))
    defined.join(front,
        defined.col(xName) === col("_sky_x") && defined.col(yName) === col("_sky_y"))
      .select(df.columns.map(defined.col): _*)
  }
}
