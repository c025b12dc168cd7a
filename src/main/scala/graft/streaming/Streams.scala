package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface of the engine. The reference has no
  * streaming at all (SURVEY.md §2.10 — its "CDC" is incremental batch over
  * staged files), so this module is green-field Spark design: the SAME
  * transformations used by the batch queries (tumbling windows = q18, dedup =
  * CDC snapshot) run under `readStream` with watermarks bounding state.
  *
  * Everything below returns plans, not started queries — callers pick sink,
  * trigger, and checkpoint location (those are deployment decisions).
  */
object Streams {

  /** File-based event stream with the events-table schema; `maxFilesPerTrigger`
    * bounds micro-batch size (backpressure knob at scale). */
  def readEventStream(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Tumbling-window counts/sums per event type — the streaming twin of
    * batch q18. Watermark bounds window state: late rows beyond it are
    * dropped, windows older than it are finalized and evicted. */
  def tumblingStats(events: DataFrame, window: String = "1 hour",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Streaming dedup by key within the watermark horizon — the streaming
    * form of the CDC latest-per-key snapshot. State is bounded: a key's
    * entry is dropped once the watermark passes it. */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream interval join: `probe` rows match `build` rows of the
    * same key whose event time falls within [probe.ts, probe.ts + within].
    * Both sides carry watermarks, so join state is bounded: a buffered row
    * is evicted once the other side's watermark passes its eligibility
    * window — the non-negotiable ingredient for an unbounded join at scale.
    * Column names must be disambiguated by the caller (prefix one side). */
  def intervalJoin(probe: DataFrame, build: DataFrame,
                   probeKey: String, buildKey: String,
                   probeTs: String, buildTs: String,
                   within: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame = {
    val p = probe.withWatermark(probeTs, watermark)
    val b = build.withWatermark(buildTs, watermark)
    p.join(b, expr(
      s"$probeKey = $buildKey AND " +
        s"$buildTs >= $probeTs AND $buildTs <= $probeTs + interval $within"))
  }

  /** Partition column of an [[upsertSink]] target: key-hash bucket. Readers
    * that want the original schema back use [[readUpsertTarget]]. */
  val UpsertBucketCol = "_kb"

  /** Micro-batch CDC upsert sink (`foreachBatch`): every micro-batch merges
    * into a parquet target by PK, newest `orderCol` wins — streaming upsert
    * without a table format. The target is laid out as parquet partitioned
    * by `_kb = pmod(xxhash64(pks), numBuckets)`, so a micro-batch merges
    * ONLY the key-hash partitions its rows land in: untouched partitions are
    * neither read (partition pruning on `_kb IN (...)`) nor rewritten
    * (dynamic partition overwrite replaces exactly the partitions present in
    * the merged output). Per-batch cost is O(|touched partitions|), not
    * O(|target|) — the property a table-format MERGE gives you, recovered on
    * plain parquet. At warehouse scale a Delta/Iceberg MERGE still wins
    * (row-level deletes, concurrent writers); the resolution logic
    * ([[graft.warehouse.Cdc.snapshot]]) is identical. */
  def upsertSink(stream: DataFrame, targetDir: String, checkpointDir: String,
                 pks: Seq[String], orderCol: String, numBuckets: Int = 16)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertBatch(batch, batchId, targetDir, pks, orderCol, numBuckets)
      }

  /** One micro-batch of the partition-scoped upsert — the foreachBatch body,
    * exposed so idempotence (checkpointed replay re-applies a batch) is
    * directly testable. Protocol: merge the batch with the TOUCHED key-hash
    * partitions into a HIDDEN staging dir under the target (dot-prefix =
    * invisible to FileIndex readers), then swap those partition dirs in with
    * renames. One write job total: the merge plan reads the old partition
    * files directly (no localCheckpoint double-materialization needed — the
    * target isn't touched until the staging write has fully committed), and
    * the repartition by bucket yields ONE file per touched partition per
    * batch instead of (shuffle tasks × buckets) fragments. Swap via rename
    * is a metadata op on HDFS/local; a failure mid-swap leaves whole
    * partitions at either the old or new version, and the checkpointed
    * batch replay re-merges idempotently (snapshot keeps newest-per-key, so
    * merging already-merged data is a no-op). */
  def upsertBatch(batch0: DataFrame, batchId: Long, targetDir: String,
                  pks: Seq[String], orderCol: String, numBuckets: Int): Unit = {
    import graft.sources.FsOps
    val spark = batch0.sparkSession
    val batch = batch0.withColumn(UpsertBucketCol,
      pmod(xxhash64(pks.map(col): _*), lit(numBuckets.toLong)).cast("int"))
    // Buckets this batch touches — bounded by numBuckets, so the collect
    // is a tiny driver-side set, never O(rows).
    val touched = batch.select(UpsertBucketCol).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (touched.nonEmpty) {
      // Target layout probe, through the Hadoop FS API so hdfs://, s3a://,
      // ... resolve correctly (a java.io.File probe would read any remote
      // target as absent and silently drop history). A bare/leftover empty
      // dir (failed first batch, eager mkdir) must read as empty, not
      // crash the stream. Three cases:
      //  - `_kb=` partition dirs → the normal partition-scoped merge;
      //  - legacy FLAT parquet files (a pre-partitioning target) → one-time
      //    MIGRATE: merge the whole target, bucket it, swap everything —
      //    pruning against a flat target would read `_kb` as null and the
      //    touched-bucket filter would silently drop all history;
      //  - neither → first batch, target starts empty.
      val entries = FsOps.list(spark, targetDir)
      val hasPartDirs = entries.exists { case (name, isDir, _) =>
        isDir && name.substring(name.lastIndexOf('/') + 1)
          .startsWith(UpsertBucketCol + "=") }
      val flatFiles = entries.collect { case (name, false, size)
        if name.endsWith(".parquet") && size > 0 => name }
      val existing =
        if (hasPartDirs)
          spark.read.schema(batch.schema).parquet(targetDir)
            .where(col(UpsertBucketCol).isin(touched: _*))
        else if (flatFiles.nonEmpty)
          spark.read.schema(batch0.schema).parquet(targetDir)
            .withColumn(UpsertBucketCol, pmod(xxhash64(pks.map(col): _*),
              lit(numBuckets.toLong)).cast("int"))
        else batch.limit(0)
      val staging = s"$targetDir/.graft_staging_$batchId"
      graft.warehouse.Cdc.snapshot(
          existing.unionByName(batch), pks, Seq(orderCol))
        .repartition(col(UpsertBucketCol))
        .write.mode("overwrite").partitionBy(UpsertBucketCol)
        .parquet(staging)
      // Migration rewrites every bucket, not just the batch's; afterwards
      // the flat files must go or readers would see history twice.
      val swap =
        if (flatFiles.nonEmpty && !hasPartDirs)
          FsOps.list(spark, staging).collect { case (name, true, _)
            if name.substring(name.lastIndexOf('/') + 1)
              .startsWith(UpsertBucketCol + "=") =>
            name.substring(name.lastIndexOf('/') + 1) }
        else touched.map(b => s"$UpsertBucketCol=$b")
      swap.foreach { part =>
        FsOps.delete(spark, s"$targetDir/$part")
        FsOps.rename(spark, s"$staging/$part", s"$targetDir/$part")
      }
      if (flatFiles.nonEmpty && !hasPartDirs)
        flatFiles.foreach(f => FsOps.delete(spark, f))
      FsOps.delete(spark, staging)
    }
    ()
  }

  /** Read an [[upsertSink]] target back with its original schema (the
    * key-hash bucket column is an internal layout detail). */
  def readUpsertTarget(spark: SparkSession, targetDir: String): DataFrame =
    spark.read.parquet(targetDir).drop(UpsertBucketCol)

  // ---- custom state: sessionization --------------------------------------

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(nEvents: Long, sumValue: Double, lastTs: Long)
  final case class SessionOut(user_id: Long, nEvents: Long, sumValue: Double,
                              closedAtMs: Long)

  /** Per-user session aggregation with an EVENT-TIME idle gap — the
    * `flatMapGroupsWithState` pattern for state Spark's built-in windows
    * can't express (variable-length sessions). A session closes when the
    * watermark passes `lastTs + gap`: deterministic and replayable, unlike
    * wall-clock ProcessingTimeTimeout (which also never lets
    * `processAllAvailable` settle in tests). State is bounded by the
    * watermark — no session outlives `gap + watermarkDelay`. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000,
                 watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.nEvents, s.sumValue,
              state.getCurrentWatermarkMs()))
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            val buf = rows.toSeq
            val next = SessionState(
              prev.nEvents + buf.size,
              prev.sumValue + buf.map(_.value).sum,
              math.max(prev.lastTs, buf.map(_.ts.getTime).maxOption.getOrElse(0L)))
            state.update(next)
            state.setTimeoutTimestamp(next.lastTs + gapMs)
            Iterator.empty
          }
      }
  }

  /** Run a streaming plan to completion against a memory sink and return the
    * collected result — the standard harness for asserting streaming
    * semantics in tests without a long-running query. */
  def runToMemory(spark: SparkSession, plan: DataFrame, name: String,
                  outputMode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = plan.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
