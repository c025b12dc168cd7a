package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability: a [[StreamingQueryListener]] that keeps a
  * rolling per-query account of micro-batch progress — rows in, batch
  * durations, rates — the numbers an operator pages on (stalled source,
  * falling throughput, state blow-up) surfaced as plain data instead of
  * log spelunking. The streaming twin of [[graft.core.Observed]].
  *
  * Listener callbacks run on the driver's listener bus — keep them O(1):
  * this one only folds counters into a map (never touches the query).
  */
object StreamMetrics {

  final case class QueryStats(name: String, batches: Long, totalRows: Long,
                              lastBatchRows: Long, lastDurationMs: Long,
                              lastRowsPerSec: Double, totalStateRows: Long)

  final class Recorder extends StreamingQueryListener {
    private val stats = TrieMap.empty[java.util.UUID, QueryStats]

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      stats.putIfAbsent(e.id, QueryStats(
        Option(e.name).getOrElse(e.id.toString), 0L, 0L, 0L, 0L, 0.0, 0L))

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val prev = stats.getOrElse(p.id,
        QueryStats(Option(p.name).getOrElse(p.id.toString), 0L, 0L, 0L, 0L, 0.0, 0L))
      val stateRows = Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L)
      val duration = Option(p.durationMs)
        .flatMap(d => Option(d.get("triggerExecution"))).map(_.longValue).getOrElse(0L)
      stats.update(p.id, prev.copy(
        batches = prev.batches + 1,
        totalRows = prev.totalRows + p.numInputRows,
        lastBatchRows = p.numInputRows,
        lastDurationMs = duration,
        lastRowsPerSec = p.processedRowsPerSecond,
        totalStateRows = stateRows))
    }

    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    /** Stats keyed by query name — when two live queries share a name (or
      * a named query restarted under a new run id), the duplicates are
      * disambiguated as `name [id]` instead of silently collapsing to
      * whichever entry iterated last. */
    def snapshot: Map[String, QueryStats] =
      stats.toMap.groupBy(_._2.name).flatMap {
        case (name, one) if one.size == 1 => one.values.map(name -> _)
        case (name, many) => many.map { case (id, s) => s"$name [$id]" -> s }
      }
  }

  /** Attach a fresh recorder to the session; caller keeps the handle and
    * removes it when done (`spark.streams.removeListener`). */
  def attach(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.streams.addListener(r)
    r
  }
}
