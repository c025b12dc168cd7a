package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the `events` stream table: ordered funnels
  * and first-order Markov transition matrices — the two standard behavioral
  * rollups a product-analytics pipeline derives from a raw event log
  * (reference scope: the events aggregations of SURVEY.md §2.4 extended to
  * ordered-sequence semantics).
  *
  * Scale shape: every stage below shuffles on the user key only — funnel
  * stage i is a join + groupBy on `userCol` (the same partitioning reused
  * across stages, and each stage's build side shrinks monotonically, so AQE
  * downgrades later joins to broadcasts); transitions are one window scan
  * per user partition plus a 25-row aggregate. Nothing materializes on the
  * driver.
  */
object Behavior {

  /** Ordered funnel: for each step k, the number of users who performed
    * step k STRICTLY AFTER their (earliest qualifying) step k-1 — the
    * "signup → view → click → purchase" conversion sequence. Per user and
    * step, the earliest qualifying timestamp is carried forward, which is
    * the standard greedy funnel semantics: matching the earliest possible
    * occurrence of each step maximizes the set of users who can complete
    * later steps (any later choice only shrinks the remaining window).
    *
    * Emits one row per step: (step_idx, step, users).
    */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("step_ts"))
    val perStep = Seq.newBuilder[DataFrame]
    perStep += reached.agg(count(lit(1)).as("users"))
      .select(lit(1).as("step_idx"), lit(steps.head).as("step"), col("users"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = reached.withColumnRenamed("step_ts", "prev_ts")
      reached = events.filter(col(typeCol) === st)
        .join(prev, userCol)
        .where(col(tsCol) > col("prev_ts"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("step_ts"))
      perStep += reached.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step_idx"), lit(st).as("step"), col("users"))
    }
    perStep.result().reduce(_ unionByName _)
  }

  /** First-order transition matrix of the event-type sequence per user:
    * (prev_type, next_type, n, ppm) where ppm is the transition probability
    * in integer parts-per-million — `(n · 1e6) div Σ_next n` stays in exact
    * integer arithmetic, so the result is engine-identical (a DOUBLE
    * probability would be division-rounding-dependent at the hash gate).
    * Ordering within a user is (ts, idCol) — the id breaks equal-timestamp
    * ties deterministically. */
  def transitions(events: DataFrame,
                  userCol: String = "user_id", typeCol: String = "event_type",
                  tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(typeCol).as("next_type"), col(tsCol), col(idCol))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
    val counts = pairs.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    // |types|² rows — the per-prev total is a window over a tiny aggregate,
    // not a second pass over the events.
    counts
      .withColumn("ppm",
        expr("(n * 1000000) div (sum(n) over (partition by prev_type))"))
      .select(col("prev_type"), col("next_type"), col("n"),
        col("ppm").cast("long").as("ppm"))
  }
}
