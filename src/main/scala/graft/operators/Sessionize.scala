package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): group per-key event streams into
  * sessions separated by an idle gap — the batch twin of
  * [[graft.streaming.Streams.sessionize]] (which holds the same semantics in
  * `flatMapGroupsWithState` state under a watermark).
  *
  * The reference has no sessionization; this is part of the engine's
  * training-data surface (user activity segmentation before per-session
  * sampling/aggregation).
  *
  * Scale shape: ONE shuffle (hash by key), then two window passes over each
  * key's sorted events — no self-join, no iteration. Keys are independent, so
  * 1000 executors each sessionize their key range; skewed keys (one user with
  * millions of events) are bounded by the window sort, not a cross product.
  * All timestamp math is integer microseconds — deterministic across engines
  * (no double epoch rounding).
  */
object Sessionize {

  /** Add `session_seq` (1-based per key) to each event: a new session starts
    * when the gap from the key's previous event exceeds `gapSec`. Ordering
    * within a key is (ts, tieBreak) so equal timestamps resolve
    * deterministically. */
  def assignSessions(df: DataFrame, keyCol: String, tsCol: String,
                     tieBreak: String, gapSec: Long): DataFrame = {
    val order = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col(tsCol))
    val prevUs = lag(us, 1).over(order)
    df.withColumn("session_seq",
      sum(when(prevUs.isNull || us - prevUs > gapSec * 1000000L, 1L)
        .otherwise(0L)).over(run))
  }

  /** Per-session stats: event count, first/last event (µs), span (µs), and
    * an exact decimal sum of `valueCol` surfaced as double. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   tieBreak: String, gapSec: Long,
                   valueCol: Column): DataFrame = {
    val us = unix_micros(col(tsCol))
    assignSessions(df, keyCol, tsCol, tieBreak, gapSec)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(us).as("first_us"),
        max(us).as("last_us"),
        (max(us) - min(us)).as("span_us"),
        sum(valueCol.cast("decimal(18,2)")).cast("double").as("sum_value"))
  }
}
