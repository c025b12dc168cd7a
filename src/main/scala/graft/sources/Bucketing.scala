package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support — the co-located-join tool for the 100 TB shape.
  *
  * Writing both sides of a recurring equi-join bucketed (and sorted) on the
  * join key means every future join of those tables is exchange-free: each
  * task zips bucket i with bucket i, no shuffle of either side, ever. This
  * is the standard amortization for fact-to-fact joins that run daily at
  * scale — pay one shuffle at write time, skip it on every read.
  * (The reference can only repartition before writes,
  * reference: utils/spark.py:119-140; bucketing is the Spark-native
  * continuation of that idea into the table format.)
  *
  * Caveats encoded here:
  *  - both sides must agree on bucket count and key, or Spark re-shuffles
  *    the mismatched side;
  *  - `spark.sql.sources.bucketing.enabled` (default true) and
  *    AQE-coalescing do not break bucket pruning;
  *  - bucketed writes require the table catalog (`saveAsTable`) — a plain
  *    `.parquet(path)` write silently drops bucketing metadata.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted table at `path` registered as `table`.
    * One shuffle now; none on any future join/aggregate on `keys`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    keys: Seq[String], numBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys — produces a plan
    * with NO Exchange on either side (verified by spec). */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
