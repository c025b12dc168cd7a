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

  /** NULL-safe key rendering for hash membership: a bare cast leaves NULL
    * keys with a NULL hash, and `NULL % 100 < pct` is NULL — the filter
    * silently dropped NULL-keyed rows at EVERY rate, including a "100%
    * sample". NULL coalesces to a sentinel, so such rows form one
    * coherent hash key (kept or dropped together, subset-monotone like
    * any other key). Oracle restatements mirror it as
    * `COALESCE(CAST(k AS VARCHAR), chr(0) || 'null')`. */
  private def keyStr(c: Column): Column =
    coalesce(c.cast("string"), lit("\u0000null"))

  /** Keep rows whose stable key hash lands below `percent` (0-100) of the
    * hash space. md5-derived ([[TextOps.h31]]) — engine-agnostic, so the
    * same sample reproduces in any system that can compute md5. */
  def hashSample(df: DataFrame, keyCol: Column, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100, s"percent out of range: $percent")
    df.filter(TextOps.h31(keyStr(keyCol)) % 100 < percent)
  }

  /** Deterministic stratified quota: at most `k` rows per stratum, chosen
    * by ascending key hash (with the key itself as tiebreak) — every
    * stratum contributes equally regardless of its size, the classic
    * rebalancing step for skewed language/source distributions.
    *
    * NULL keys hash via the [[keyStr]] sentinel: a bare cast left the
    * hash NULL, and the two engines ORDER null hashes oppositely (Spark
    * asc = nulls first, DuckDB asc = nulls last), so a NULL-keyed row
    * consumed a quota slot on one engine only. With the sentinel,
    * several NULL-keyed rows in one stratum tie exactly like duplicate
    * non-null keys always have (equal hash, equal key) — rank among
    * them is arbitrary; distinct keys stay total-ordered. */
  def stratifiedQuota(df: DataFrame, strataCol: Column, keyCol: Column,
                      k: Int): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(TextOps.h31(keyStr(keyCol)).asc, keyCol.asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Rebalance a skewed source mix toward equal shares: source s keeps
    * rows at rate min(1, N/(S·n_s)) — sources at or below the equal share
    * N/S keep everything, over-represented sources are down-sampled to it.
    * Rates are integer ppm computed from exact counts; membership is the
    * same subset-monotone key-hash rule as [[hashSample]], so the mix is
    * reproducible on any partitioning and across engines. The S-row rate
    * table broadcasts back onto the corpus. NULL sources are coalesced to
    * a sentinel group of their own, so they are counted toward the share
    * math and kept/down-sampled like any other source rather than silently
    * dropped by the join (countDistinct and an equi-join both skip NULL). */
  def balanceSources(df: DataFrame, sourceCol: Column, keyCol: Column): DataFrame = {
    val srcKey = coalesce(sourceCol.cast("string"), lit("\u0000null"))
    val counts = df.groupBy(srcKey.as("__src"))
      .agg(count(lit(1)).as("n_s"))
    val totals = df.select(count(lit(1)).as("n_tot"),
      countDistinct(srcKey).as("n_src"))
    val rates = counts.crossJoin(totals).select(col("__src"),
      least(lit(1000000L),
        expr("(n_tot * 1000000) div (n_src * n_s)")).as("rate_ppm"))
    df.join(broadcast(rates), srcKey === col("__src"))
      .where(TextOps.h31(keyStr(keyCol)) % 1000000L < col("rate_ppm"))
      .drop("__src")
  }

  /** Deterministic weighted sample without replacement (Efraimidis-
    * Spirakis A-ES): each row draws priority u^(1/w) with u a key-hash
    * uniform in (0,1); the k highest priorities are the sample —
    * P[selected] ∝ weight, reproducible because u comes from the key, not
    * an RNG. The top-k executes as TakeOrderedAndProject (per-partition
    * heads + driver merge), NOT a global sort or one-partition window —
    * the same plan shape at 500 rows and 500 billion. Rows with
    * non-positive weight are excluded. */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column,
                     k: Int): DataFrame = {
    // keyStr: the one sampler the NULL-key sentinel fix initially missed —
    // a NULL key made priority NULL, which sorts last under desc in Spark
    // but FIRST in DuckDB, so the row was silently never sampled here and
    // always sampled by the oracle.
    val u = (TextOps.h31(keyStr(keyCol)) + 1).cast("double") /
      2147483648.0
    val priority = pow(u, lit(1.0) / weightCol.cast("double"))
    df.filter(weightCol > 0)
      .withColumn("priority", priority)
      .orderBy(col("priority").desc, keyCol.asc)
      .limit(k)
  }
}
