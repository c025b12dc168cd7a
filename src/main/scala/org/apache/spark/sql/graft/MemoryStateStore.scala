package org.apache.spark.sql.graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.execution.streaming.state._
import org.apache.spark.sql.types.StructType

/** Process-memory state store for BOUNDED streaming replays (guide §5: the
  * HDFS-backed store's per-batch delta-file commits — create + checksum +
  * rename per store per micro-batch — are pure fixed cost when the state
  * never needs to outlive the process).
  *
  * Semantics, stated precisely:
  *
  *  - WITHIN one process, full state-store semantics: versioned commits,
  *    task retry (a retried task reloads the last committed version from
  *    the process-wide registry), abort, multiple stateful operators.
  *  - ACROSS processes, NO recovery: asking for a version this process
  *    never committed (i.e. resuming someone else's checkpoint) throws
  *    loudly instead of silently recomputing wrong state. This provider is
  *    therefore ONLY correct for AvailableNow / bounded-replay jobs whose
  *    failure story is "re-run from a fresh checkpoint" — exactly the
  *    engine's streaming query surface, where every run stages a fresh
  *    checkpoint dir. Long-lived production streams must keep the durable
  *    default (HDFS-backed / RocksDB); the queries gate on
  *    [[graft.core.Gates.StreamMemoryStateStore]] so the all-twins suite
  *    forces the durable path end-to-end.
  *  - Feature surface mirrors HDFSBackedStateStoreProvider: default column
  *    family only, no multi-value keys, no prefix scan (none of the
  *    engine's streaming operators — windowed agg, stream-stream join,
  *    dedup, flatMapGroupsWithState — issue prefix scans; session-window
  *    aggregation would, and fails loudly here).
  *
  * Memory: state lives on-heap, one map per (store, version), the last
  * `minVersionsToRetain`-bounded (≤ [[MaxRetainedVersions]]) versions
  * retained for retry/replay. Bounded replays have bounded state by the
  * same watermark arithmetic that bounds the durable store.
  */
class MemoryStateStoreProvider extends StateStoreProvider {
  import MemoryStateStoreProvider._

  private var id: StateStoreId = _
  private var keySchema: StructType = _
  private var valueSchema: StructType = _
  private var retain = 2
  // Guarded by `this`: a straggler task's commit() racing close() must not
  // resurrect the registry entry after the quiesce removed it (the entry
  // would leak for the process lifetime — nothing closes twice).
  private var providerClosed = false

  override def init(stateStoreId: StateStoreId, keySchema: StructType,
                    valueSchema: StructType,
                    keyStateEncoderSpec: KeyStateEncoderSpec,
                    useColumnFamilies: Boolean, storeConf: StateStoreConf,
                    hadoopConf: Configuration,
                    useMultipleValuesPerKey: Boolean,
                    stateSchemaProvider: Option[StateSchemaProvider]): Unit = {
    if (useColumnFamilies)
      throw StateStoreErrors.multipleColumnFamiliesNotSupported(ProviderName)
    if (useMultipleValuesPerKey)
      throw StateStoreErrors.unsupportedOperationException(
        "useMultipleValuesPerKey", ProviderName)
    this.id = stateStoreId
    this.keySchema = keySchema
    this.valueSchema = valueSchema
    // ≥2 so the version a retried batch re-reads is always resident; capped
    // so a conservatively-huge session default can't pin every version of a
    // long replay on the heap.
    this.retain = math.max(2, math.min(storeConf.minVersionsToRetain,
      MaxRetainedVersions))
  }

  override def stateStoreId: StateStoreId = id

  /** Providers are closed when the query ends (or the suite's quiesce stops
    * the state stores); the process-wide registry entry dies with it, so a
    * benchmark loop cannot accumulate state across runs. A provider
    * unloaded MID-query would lose its versions and the reload would throw
    * (see getStore) — acceptable, since unload-while-active only happens
    * when a partition migrates executors, which the cross-process rule
    * above already declares unsupported. */
  override def close(): Unit = synchronized {
    providerClosed = true
    registry.remove(regKey(id))
    ()
  }

  override def getStore(version: Long, uniqueId: Option[String]): StateStore = {
    require(version >= 0, s"invalid state version $version")
    if (uniqueId.isDefined)
      throw StateStoreErrors.unsupportedOperationException(
        "checkpoint-v2 unique ids", ProviderName)
    val base = new java.util.HashMap[UnsafeRow, UnsafeRow]()
    if (version > 0) {
      val versions = registry.get(regKey(id))
      val prev = if (versions == null) null else versions.synchronized {
        versions.get(version)
      }
      if (prev == null) throw new IllegalStateException(
        s"$ProviderName holds state only in process memory and version " +
          s"$version of $id is not resident. This provider cannot resume a " +
          "checkpoint written by another process — use it only for bounded " +
          "replays that start from a fresh checkpoint, or keep the durable " +
          "default provider.")
      base.putAll(prev)
    }
    new MemoryStateStore(version, base)
  }

  /** One committed-versions map per store, shared across provider
    * instances of this process so task retries and provider reloads see
    * committed state. */
  private def versionsFor(sid: StateStoreId) =
    registry.computeIfAbsent(regKey(sid),
      _ => new java.util.TreeMap[Long, java.util.HashMap[UnsafeRow, UnsafeRow]]())

  private class MemoryStateStore(
      loadedVersion: Long,
      map: java.util.HashMap[UnsafeRow, UnsafeRow]) extends StateStore {

    private val newVersion = loadedVersion + 1
    private var committed = false
    private var aborted = false

    private def requireDefaultCf(colFamilyName: String): Unit =
      if (colFamilyName != StateStore.DEFAULT_COL_FAMILY_NAME)
        throw StateStoreErrors.multipleColumnFamiliesNotSupported(ProviderName)

    /** Mutations are only legal while UPDATING (HDFSBackedStateStore's
      * posture): after commit() the working map IS the registered version,
      * so a zombie task writing through it would corrupt committed state
      * the next batch loads — fail loudly instead. Reads (get/iterator)
      * stay legal after commit (operators consume output iterators after
      * the commit callback). */
    private def requireUpdating(op: String): Unit =
      require(!committed && !aborted,
        s"cannot $op a state store that is already " +
          s"${if (committed) "committed" else "aborted"}")

    override def id: StateStoreId = MemoryStateStoreProvider.this.id
    override def version: Long = loadedVersion

    override def get(key: UnsafeRow, colFamilyName: String): UnsafeRow = {
      requireDefaultCf(colFamilyName)
      map.get(key)
    }

    override def valuesIterator(key: UnsafeRow,
                                colFamilyName: String): Iterator[UnsafeRow] = {
      requireDefaultCf(colFamilyName)
      Option(map.get(key)).iterator
    }

    override def prefixScan(prefixKey: UnsafeRow, colFamilyName: String)
        : StateStoreIterator[UnsafeRowPair] =
      throw StateStoreErrors.unsupportedOperationException(
        "prefixScan", ProviderName)

    override def iterator(colFamilyName: String)
        : StateStoreIterator[UnsafeRowPair] = {
      requireDefaultCf(colFamilyName)
      val pair = new UnsafeRowPair()
      val it = new java.util.ArrayList(map.entrySet()).iterator()
      new StateStoreIterator(new Iterator[UnsafeRowPair] {
        override def hasNext: Boolean = it.hasNext
        override def next(): UnsafeRowPair = {
          val e = it.next()
          pair.withRows(e.getKey, e.getValue)
        }
      })
    }

    override def put(key: UnsafeRow, value: UnsafeRow,
                     colFamilyName: String): Unit = {
      requireDefaultCf(colFamilyName)
      requireUpdating("put to")
      require(value != null, "Cannot put a null value")
      // copy: callers reuse the row buffers they pass in
      map.put(key.copy(), value.copy())
      ()
    }

    override def putList(key: UnsafeRow, values: Array[UnsafeRow],
                         colFamilyName: String): Unit =
      throw StateStoreErrors.unsupportedOperationException(
        "putList", ProviderName)

    override def remove(key: UnsafeRow, colFamilyName: String): Unit = {
      requireDefaultCf(colFamilyName)
      requireUpdating("remove from")
      map.remove(key)
      ()
    }

    override def merge(key: UnsafeRow, value: UnsafeRow,
                       colFamilyName: String): Unit =
      throw StateStoreErrors.unsupportedOperationException(
        "merge", ProviderName)

    override def mergeList(key: UnsafeRow, values: Array[UnsafeRow],
                           colFamilyName: String): Unit =
      throw StateStoreErrors.unsupportedOperationException(
        "mergeList", ProviderName)

    override def createColFamilyIfAbsent(colFamilyName: String,
        keySchema: StructType, valueSchema: StructType,
        keyStateEncoderSpec: KeyStateEncoderSpec, useMultipleValuesPerKey: Boolean,
        isInternal: Boolean): Unit =
      throw StateStoreErrors.multipleColumnFamiliesNotSupported(ProviderName)

    override def removeColFamilyIfExists(colFamilyName: String): Boolean =
      throw StateStoreErrors.multipleColumnFamiliesNotSupported(ProviderName)

    override def commit(): Long = {
      requireUpdating("commit")
      MemoryStateStoreProvider.this.synchronized {
        // A commit landing after close() (straggler task racing the
        // quiesce) must not resurrect the registry entry: the query is
        // being torn down and nothing would ever remove it again. The
        // task-level commit still succeeds — its output was produced —
        // the state is simply not retained, matching "this process no
        // longer serves this store".
        if (!providerClosed) {
          val versions = versionsFor(MemoryStateStoreProvider.this.id)
          versions.synchronized {
            versions.put(newVersion, map)
            while (versions.size > retain) versions.pollFirstEntry()
          }
        }
      }
      committed = true
      newVersion
    }

    override def abort(): Unit = {
      // working map is private to this store instance; dropping the
      // reference is the whole rollback
      aborted = true
    }

    override def metrics: StateStoreMetrics = {
      var bytes = 0L
      map.forEach((k, v) => bytes += k.getSizeInBytes + v.getSizeInBytes)
      StateStoreMetrics(map.size().toLong, bytes, Map.empty, Map.empty)
    }

    override def getStateStoreCheckpointInfo(): StateStoreCheckpointInfo =
      StateStoreCheckpointInfo(
        MemoryStateStoreProvider.this.id.partitionId, newVersion, None, None)

    override def hasCommitted: Boolean = committed
  }
}

object MemoryStateStoreProvider {
  val ProviderName = "org.apache.spark.sql.graft.MemoryStateStoreProvider"

  /** Upper bound on retained versions per store — retry/replay needs the
    * previous couple of versions, never a deep history. */
  val MaxRetainedVersions = 10

  private type Versions = java.util.TreeMap[Long, java.util.HashMap[UnsafeRow, UnsafeRow]]

  /** (checkpoint root, operator, partition, store name) → committed
    * versions. Process-wide so provider reloads within one run see
    * committed state; entries are dropped when their provider closes. */
  private val registry = new ConcurrentHashMap[(String, Long, Int, String), Versions]()

  private def regKey(id: StateStoreId): (String, Long, Int, String) =
    (id.checkpointRootLocation, id.operatorId, id.partitionId, id.storeName)

  /** Test/diagnostic hook: number of registered (store → versions) entries. */
  def registeredStores: Int = registry.size()
}
