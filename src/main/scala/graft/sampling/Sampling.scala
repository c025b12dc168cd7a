package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Deterministic sampling for training-data pipelines. `df.sample()` /
  * `sampleBy()` draw per-row randoms, so results change with partitioning
  * and retries — unacceptable when a sample defines a dataset release.
  * Hash-based sampling decides membership from the ROW KEY alone:
  * reproducible on any cluster layout, stable across reruns, and
  * subset-monotone (raising the rate keeps every previously selected row —
  * pct < 10 rows are a subset of pct < 20 rows).
  */
object Sampling {

  /** Keep rows whose stable key hash lands below `percent` (0-100) of the
    * hash space. md5-derived ([[TextOps.h31]]) — engine-agnostic, so the
    * same sample reproduces in any system that can compute md5. */
  def hashSample(df: DataFrame, keyCol: Column, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100, s"percent out of range: $percent")
    df.filter(TextOps.h31(keyCol.cast("string")) % 100 < percent)
  }

  /** Deterministic stratified quota: at most `k` rows per stratum, chosen
    * by ascending key hash (with the key itself as tiebreak) — every
    * stratum contributes equally regardless of its size, the classic
    * rebalancing step for skewed language/source distributions. */
  def stratifiedQuota(df: DataFrame, strataCol: Column, keyCol: Column,
                      k: Int): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(TextOps.h31(keyCol.cast("string")).asc, keyCol.asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }
}
