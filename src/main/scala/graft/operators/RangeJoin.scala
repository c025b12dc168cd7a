package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — points to enclosing intervals — via time
  * bucketing, the standard trick that turns an inequality join into an
  * equi-join Spark can hash/sort-merge:
  *
  *  - each point maps to ONE bucket of width `bucketMicros`;
  *  - each interval explodes to the buckets it covers;
  *  - the join key becomes (business key, bucket) — an equi-join with
  *    partition-able shuffle — and the exact `start <= ts < end` predicate
  *    filters residually inside the join.
  *
  * A raw `ts >= start AND ts < end` join condition would force a
  * broadcast-nested-loop (quadratic per key); bucketing makes the cost
  * |points| + Σ interval-spans, and each (point, interval) pair meets
  * exactly once because a point lives in exactly one bucket. Pick
  * `bucketMicros` near the median interval length: too small explodes the
  * interval side, too large degrades the equi-join's selectivity.
  */
object RangeJoin {

  /** Inner join: every point row with every same-key interval containing
    * its timestamp (`start <= ts < end`). Carries all point columns plus
    * `intervalCols` from the interval side (names must not collide).
    * Intervals with `end <= start` are empty and dropped. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointKeys: Seq[String], intervalKeys: Seq[String],
                      tsCol: String, startCol: String, endCol: String,
                      intervalCols: Seq[String],
                      bucketMicros: Long = 3600L * 1000000L): DataFrame = {
    require(pointKeys.length == intervalKeys.length, "key arity mismatch")
    // Same reserved-column posture as AsOfJoin/Ranked: an input that
    // already carries __bucket would be silently overwritten and the
    // final projection would emit internal bucket ids under the user's
    // column — corrupt output with no error.
    require(!points.columns.contains("__bucket") &&
        !intervals.columns.contains("__bucket"),
      "__bucket is reserved by pointInInterval; rename the input column")
    val dupOut = intervalCols.filter(points.columns.contains)
    require(dupOut.isEmpty,
      s"intervalCols ${dupOut.mkString(", ")} collide with point columns; " +
        "the joined output would carry ambiguous duplicate names")
    // Bucket ids via INTEGER division (`div`), not double `floor(x / b)`:
    // long/long widens to double, and past ~2^53 µs the quotient's
    // rounding error exceeds the bucket spacing, so a boundary point
    // could land in a bucket the enclosing interval never explodes to —
    // a silently missing inner-join row (the residual predicate only
    // removes false positives, it can't recover false negatives). Any
    // MONOTONE integer bucketing is correct as long as both sides share
    // it; `div` (truncation) is monotone and exact at every magnitude.
    def bucketOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      org.apache.spark.sql.graft.Bridge.toColumn(
        new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graft.Bridge.toExpr(c),
          org.apache.spark.sql.catalyst.expressions.Literal(bucketMicros)))
    val p = points
      .withColumn("__bucket", bucketOf(unix_micros(col(tsCol))))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        bucketOf(unix_micros(col(startCol))),
        bucketOf(unix_micros(col(endCol)) - 1))))
      .select((intervalKeys.map(col) :+ col("__bucket") :+
        col(startCol) :+ col(endCol)) ++ intervalCols.map(col): _*)
    val keyCond = pointKeys.zip(intervalKeys)
      .map { case (pk, ik) => p(pk) === iv(ik) }
      .reduce(_ && _)
    p.join(iv,
        keyCond && p("__bucket") === iv("__bucket") &&
          p(tsCol) >= iv(startCol) && p(tsCol) < iv(endCol))
      .select(points.columns.map(p(_)) ++ intervalCols.map(iv(_)): _*)
  }
}
