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
    * x value — if x is near-unique at your scale, pre-bucket x or use the
    * range-partitioned variant of this scan instead.
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
}
