package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Guard for operators whose work EXPANDS downstream of the scan — shingle
  * explodes, in-block pair enumeration, per-token hashing. Task count up to
  * the first exchange equals the scan partition count, and a corpus small
  * enough to land in one parquet split arrives as ONE partition, so the
  * whole explosion runs on one core while the rest of the cluster idles
  * (measured on a 10× documents table: simhash 63s single-task where the
  * same work fans to ~5s; the naive jaccard pegged one core for 9+ minutes
  * before dying).
  *
  * The fan-out must cost ~nothing when it doesn't apply, so the decision
  * uses the ANALYZED plan's size estimate (a stats visitor over the cached
  * FileIndex — no optimization, no physical planning; `df.rdd`-based
  * probing measured ~0.5-1s per query and the unconditional repartition
  * another ~1s, visibly regressing every sub-second corpus query at
  * bench scale):
  *
  *  - estimated scan partitions (bytes / `maxPartitionBytes`) already at or
  *    above cluster parallelism → pass through untouched. A 100 TB corpus
  *    scans as thousands of partitions and must never pay a gratuitous
  *    full-corpus exchange.
  *  - input smaller than `minBytes` → pass through untouched: a single
  *    task finishes faster than the exchange round-trip it would save.
  *    Callers whose per-row work is super-linear (pair enumeration over
  *    blocks: quadratic in block size) pass `minBytes = 0` — for them even
  *    a 200 KB dim table hides seconds of single-task work (q108: 3.6s →
  *    1.1s).
  *  - otherwise → one exchange of the narrow pre-explosion input unlocks
  *    every core.
  */
object Parallelize {

  /** Repartition `df` to cluster parallelism iff it is estimated to scan
    * with fewer partitions AND carries at least `minBytes`. With `by`
    * columns: hash-partition on those (keeps same-key rows co-located for
    * a downstream keyed op); without: round-robin. */
  val DefaultMinBytes: Long = 2L << 20

  def fanOut(df: DataFrame): DataFrame = fanOut(df, DefaultMinBytes)

  def fanOut(df: DataFrame, minBytes: Long, by: Column*): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val bytes = df.queryExecution.analyzed.stats.sizeInBytes
    val maxPart = BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
    val estScanParts = (bytes + maxPart - 1) / maxPart
    if (bytes < minBytes || estScanParts >= target) df
    else if (by.isEmpty) df.repartition(target)
    else df.repartition(target, by: _*)
  }
}
