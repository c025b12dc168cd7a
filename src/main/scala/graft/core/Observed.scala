package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Declarative pipeline metrics via `Dataset.observe` — the modern
  * counterpart to [[JobContext]]'s accumulators (reference A8,
  * utils/Utilities.py:300-322): metrics are aggregate expressions that
  * RIDE the query (computed inside the same pass, no extra job, no
  * side-channel mutation) and arrive through a QueryExecutionListener when
  * the action completes. Use observe for declarative plans; JobContext for
  * imperative mapPartitions/foreachPartition blocks where expressions
  * can't reach.
  */
object Observed {

  /** Attach named metrics to the frame: `withMetrics(df, "stage1",
    * count(lit(1)).as("rows"), sum($"err").as("errs"))`. */
  def withMetrics(df: DataFrame, name: String, metrics: Column*): DataFrame = {
    require(metrics.nonEmpty,
      s"withMetrics('$name') needs at least one metric column")
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  /** Listener collecting every observation by name. Register once per
    * session; `latest` is safe to read from any thread. */
  final class MetricsListener extends QueryExecutionListener {
    private val metrics = new ConcurrentHashMap[String, Row]()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (k, v) => metrics.put(k, v) }
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    def latest(name: String): Option[Row] = Option(metrics.get(name))
    /** Poll until the named observation lands (listener delivery is
      * async), then CONSUME it: awaiting removes the entry, so a loop
      * that reuses one observation name gets each action's OWN row —
      * a presence-only check returned run k's stale metrics while run
      * k+1's callback was still in flight. (Await each action before
      * triggering the next; an un-awaited earlier action's row is
      * indistinguishable by design — observations carry no run id.) */
    def await(name: String, timeoutMs: Long = 10000): Row = {
      val deadline = System.currentTimeMillis() + timeoutMs
      var row = metrics.remove(name)
      while (row == null && System.currentTimeMillis() < deadline) {
        Thread.sleep(20)
        row = metrics.remove(name)
      }
      if (row == null)
        throw new IllegalStateException(s"observation '$name' never arrived")
      row
    }
  }

  /** Register a metrics listener on the session and return it. */
  def attach(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }
}
