package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Approximate-sketch surface for the scales where exact answers stop being
  * affordable: distinct counting (Datasketches HLL), heavy hitters
  * (Count-Min), and quantiles (approx_percentile). Sketches are the 100 TB
  * path for the exact operators elsewhere in the library (q07 dup counts,
  * q64 percentiles): mergeable partial state, one pass, bounded memory —
  * the same contract as a partial aggregate, so they re-aggregate across
  * partitions, days, or tables without rescanning raw data.
  *
  * These are NOT oracle-gated: a cross-engine hash gate is meaningless for
  * estimators whose value depends on the sketch implementation. Instead
  * SketchesSpec bounds the estimation error against exact answers on the
  * driver tables — the property a user actually relies on.
  */
object Sketches {

  /** Per-group approximate distinct count via Datasketches HLL
    * (`hll_sketch_agg`): mergeable, ~1.6% relative error at lgK=12 with
    * fixed bounded memory per group — versus exact `count(distinct)`
    * which shuffles every distinct value. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col(valueCol), lit(lgK))).cast("double")
        .as("approx_distinct"))

  /** Mergeable form: per-group HLL sketch BINARIES, re-aggregable with
    * [[mergeDistinct]] — store day-grain sketches, serve any coarser grain
    * without touching raw data (the q100 partial-reagg pattern, approximate
    * edition). */
  def distinctSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Combine stored sketches to a coarser grain and estimate. */
  def mergeDistinct(sketches: DataFrame, groupCols: Seq[String],
                    sketchCol: String = "hll"): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol))).cast("double")
        .as("approx_distinct"))

  /** Count-Min heavy-hitter sketch over a column, built distributed
    * (mergeable per-partition sketches) and returned as a driver-side
    * queryable object: estimateCount(v) ≥ true count, overestimate bounded
    * by eps·N with confidence 1−δ. */
  def countMin(df: DataFrame, valueCol: String,
               eps: Double = 0.001, confidence: Double = 0.99,
               seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(valueCol, eps, confidence, seed)

  /** Grouped approximate percentiles: `accuracy` trades memory for rank
    * error (rank error ≤ 1/accuracy of the row count). */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      percentiles: Seq[Double],
                      accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        array(percentiles.map(lit): _*), lit(accuracy)).as("quantiles"))

  /** Sketch-based distinct-similarity of two keyed sets (|A∩B| / |A∪B| via
    * inclusion–exclusion on HLL estimates) — the cheap pre-screen before an
    * exact q25-style intersection join at corpus scale.
    *
    * EAGER: runs one Spark job and returns the estimate as a literal (the
    * Column return type is for composing the result, not the computation).
    * All three estimates come from a single scan of the tagged union —
    * |A|, |B|, and |A∪B| as three HLL aggregates over one pass — where the
    * per-frame formulation scanned each input twice across three jobs. */
  def jaccardEstimate(a: DataFrame, b: DataFrame, valueCol: String,
                      lgK: Int = 12): Column = {
    val tagged = a.select(col(valueCol).as("v"), lit(true).as("is_a"))
      .unionByName(b.select(col(valueCol).as("v"), lit(false).as("is_a")))
    // coalesce: an empty (or all-null) side aggregates to a NULL sketch,
    // whose estimate must read as 0 distinct values, not a driver NPE.
    def est(c: Column) = coalesce(hll_sketch_estimate(c).cast("double"), lit(0.0))
    val r = tagged.agg(
      est(hll_sketch_agg(when(col("is_a"), col("v")), lit(lgK))).as("na"),
      est(hll_sketch_agg(when(!col("is_a"), col("v")), lit(lgK))).as("nb"),
      est(hll_sketch_agg(col("v"), lit(lgK))).as("nu")).head
    val (na, nb, nu) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    // Clamp to [0, 1] and define the empty case: two empty (or all-null)
    // inputs gave 0/0 = NaN, and HLL estimator error on near-disjoint
    // sets can push the inclusion-exclusion intersection negative — both
    // nonsense as a similarity. Empty ∪ empty → 0.0 by convention.
    val j =
      if (nu <= 0.0) 0.0
      else math.min(1.0, math.max(0.0, na + nb - nu) / nu)
    lit(j)
  }
}
