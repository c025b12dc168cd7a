package graft.core

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Named counter registry over Spark accumulators (SURVEY.md §2.4 A8;
  * reference: utils/Utilities.py:300-322 `JobContext`). Counters are
  * registered lazily by name, incremented from executor-side code, and
  * reported as a fixed-width table — the reference's tabulated print.
  *
  * For declarative pipelines prefer `Dataset.observe()` (metrics ride the
  * query, no side channel); this registry serves imperative
  * `mapPartitions`/`foreachPartition` blocks where observe can't reach.
  */
final class JobContext(spark: SparkSession) extends Serializable {

  private val counters = TrieMap.empty[String, LongAccumulator]

  /** Get-or-register the named counter. Registration is DRIVER-ONLY: an
    * accumulator must be created on the driver to be merged back from
    * tasks. Executor-side lookup of a pre-registered name returns the
    * serialized accumulator; an unregistered name off-driver fails fast
    * with a clear error instead of crashing on the transient SparkContext. */
  def counter(name: String): LongAccumulator =
    counters.getOrElse(name, {
      if (org.apache.spark.TaskContext.get() != null)
        throw new IllegalStateException(
          s"JobContext counter '$name' used on an executor before being " +
            "registered on the driver; call counter(name) driver-side first")
      counters.getOrElseUpdate(name, spark.sparkContext.longAccumulator(name))
    })

  def inc(name: String, by: Long = 1L): Unit = counter(name).add(by)

  def value(name: String): Long =
    counters.get(name).map(_.value.longValue).getOrElse(0L)

  def snapshot: Map[String, Long] =
    counters.view.mapValues(_.value.longValue).toMap

  /** Fixed-width counter table (reference parity: Utilities.py:311-322). */
  def report: String = {
    val rows = snapshot.toSeq.sortBy(_._1)
    if (rows.isEmpty) "no counters"
    else {
      val w = math.max(7, rows.map(_._1.length).max)
      (f"%%-${w}s  value".format("counter") +:
        rows.map { case (k, v) => f"%%-${w}s  %%d".format(k, v) }).mkString("\n")
    }
  }
}
