package graft.core

import org.apache.spark.sql.SparkSession

/** The session-conf keys behind every kernel/driver-shortcut guard, in ONE
  * place referenced by both the operators that read them and the
  * all-twins Verify mode that zeroes them. The keys were previously
  * string literals duplicated across files; a rename on either side would
  * have silently desynchronized them — the operators would keep their
  * fast paths while `SPARK_GRAFT_FORCE_TWINS=1` set a dead key, and the
  * "all twins, 134/134" gate would pass vacuously, certifying fallbacks
  * that never ran. A shared constant makes that drift a compile error.
  */
object Gates {

  /** Broadcast pair-kernel corpus-row guard (Dedup q39/q134 family). */
  val DedupKernelMaxCorpusRows = "spark.graft.dedup.kernelMaxCorpusRows"

  /** Driver union-find edge guard (Dedup.dupClusters). */
  val DedupDriverEdgeLimit = "spark.graft.dedup.driverEdgeLimit"

  /** Driver BFS edge guard (Reach.shortestHops). */
  val ReachDriverEdgeLimit = "spark.graft.reach.driverEdgeLimit"

  /** Basket rescan-vs-materialize input-size gate. */
  val BasketRescanMaxInputBytes = "spark.graft.basket.rescanMaxInputBytes"

  /** Driver power-iteration edge guard (analytics.Graph.pagerank). */
  val GraphDriverEdgeLimit = "spark.graft.graph.driverEdgeLimit"

  /** Ranked plain-window small-input gate (operators.Ranked): at or below
    * this many estimated input bytes the plain partitioned window runs
    * instead of the range-partitioned decomposition. 0 = ranged always
    * (the 100 TB shape), which is what the all-twins mode wants primary. */
  val RankedSmallInputMaxBytes = "spark.graft.ranked.smallInputMaxBytes"

  /** termFrequencies exchange-shape gate (r13): at or below this many
    * estimated input bytes (×4 decompression factor) the corpus keeps the
    * local fanOut shape (narrow aggregated exchanges); above it, documents
    * are repartitioned BY ID pre-explode so one document-sized exchange
    * serves the tf agg and every per-doc consumer. 0 = id-keyed always
    * (the 100 TB shape, all-twins primary). */
  val CorpusTfSmallInputMaxBytes = "spark.graft.corpus.tfSmallInputMaxBytes"

  /** Streaming memory-state-store gate (r13): >0 (default 1) = the
    * engine's bounded-replay AvailableNow streaming queries run on the
    * process-memory state-store provider
    * ([[org.apache.spark.sql.graft.MemoryStateStoreProvider]] — no
    * per-batch delta-file commits; no cross-process recovery, which
    * bounded replays with fresh checkpoints never need). 0 = the durable
    * default provider, the long-lived-stream / 100 TB posture the
    * all-twins mode forces primary. */
  val StreamMemoryStateStore = "spark.graft.stream.memoryStateStore"

  /** Every guard the all-twins mode must force to 0 — extend this list
    * when a new driver shortcut gains a guard, and the suite gate follows
    * automatically. */
  val All: Seq[String] = Seq(DedupKernelMaxCorpusRows, DedupDriverEdgeLimit,
    ReachDriverEdgeLimit, BasketRescanMaxInputBytes, RankedSmallInputMaxBytes,
    GraphDriverEdgeLimit, StreamMemoryStateStore, CorpusTfSmallInputMaxBytes)

  /** Decompression safety factor applied to compressed (parquet-scan)
    * size estimates by the size gates that must err toward their SCALE
    * path (Ranked's plain-window gate, Corpus' tf-shape gate): columnar
    * data commonly decompresses 4-10×, so comparing a compressed estimate
    * against a raw-sized threshold would under-gate by that ratio. One
    * shared constant so the two gates can't drift apart on recalibration. */
  val DecompressionSafetyFactor = 4

  /** Effective guard value: the session conf wins over the call-site
    * default, so a whole suite can repoint every guard without threading
    * knobs through callers. */
  def effectiveLimit(spark: SparkSession, key: String, default: Long): Long =
    spark.conf.get(key, default.toString).toLong
}
