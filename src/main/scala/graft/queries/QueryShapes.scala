package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan shapes shared across query packs — one definition for semantics
  * that several queries must implement IDENTICALLY. */
private[queries] object QueryShapes {

  /** SQL-standard empty-relation correction for cube/rollup over
    * long-cents money partials (see q57_cube's scaladoc): Spark's
    * cube/rollup over an EMPTY input emits zero rows where the standard
    * (and the DuckDB oracle) emits the () subtotal row with COUNT 0 /
    * NULL sums. The correction is a global aggregate over the SAME
    * partials frame — it always yields exactly one row and survives its
    * own filter only when the count is 0, i.e. exactly when the input
    * was empty; same-partials reuse keeps one fact pass (ReusedExchange,
    * pinned in PlanRegressionSpec). Lived as two hand-synced copies in
    * q49/q57 until round 11's review pass; a fix applied to one copy
    * would have drifted the other. */
  def emptyGroupingCorrection(partials: DataFrame, centsCol: String,
                              moneyAlias: String, countCol: String,
                              countAlias: String, nullCols: Seq[String],
                              gid: Int): DataFrame =
    partials.agg(
        graft.functions.Money
          .toMajor(sum(col(centsCol).cast("decimal(38,0)")), 100)
          .as(moneyAlias),
        coalesce(sum(col(countCol)), lit(0L)).as(countAlias))
      .where(col(countAlias) === 0)
      .select(nullCols.map(c => lit(null).cast("string").as(c)) ++
        Seq(col(moneyAlias), col(countAlias),
          lit(gid).cast("int").as("gid")): _*)
}
