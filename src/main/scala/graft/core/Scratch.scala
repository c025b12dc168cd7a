package graft.core

import java.io.File

/** Scratch-dir hygiene: queries that exercise sinks (roundtrips, streaming
  * staging/checkpoints) create `graft_*` temp dirs per run; repeated
  * verify/bench invocations would otherwise accrete thousands of them.
  * [[cleanStale]] removes this process's naming-convention dirs older than
  * `maxAgeMs` — the age guard keeps concurrently-running JVMs safe.
  */
object Scratch {

  /** Local-mode scratch root, fastest first: tmpfs (/dev/shm) when present
    * and writable, else java.io.tmpdir. Streaming fixtures — checkpoint
    * dirs, staged inputs, upsert targets — are latency-bound on many tiny
    * file ops (state-store deltas, commit markers, partition renames), and
    * on this harness /tmp is ext4 while /dev/shm is tmpfs: measured at
    * sf0.1, moving q63's scratch to tmpfs alone cut ~0.3-0.5s/run. On a
    * real cluster these paths are HDFS/S3 locations chosen by the
    * deployment, not this helper — this is single-box bench hygiene, the
    * same class of choice as pointing spark.local.dir at fast disk. */
  private lazy val root: java.nio.file.Path = {
    val shm = new File("/dev/shm")
    // Capacity gate: container runtimes commonly mount /dev/shm at 64 MB,
    // and RAM-backed scratch competes with the JVM heap — only prefer
    // tmpfs when it has real headroom for the streaming fixtures.
    val base =
      if (shm.isDirectory && shm.canWrite &&
          shm.getUsableSpace > 8L * 1024 * 1024 * 1024) shm
      else new File(System.getProperty("java.io.tmpdir"))
    base.toPath
  }

  /** Create a fresh scratch dir under the fast root. Prefix is forced into
    * the `graft` namespace so [[cleanStale]] can reclaim it. */
  def tempDir(prefix: String): java.nio.file.Path = {
    val p = if (prefix.startsWith("graft")) prefix else s"graft_$prefix"
    java.nio.file.Files.createTempDirectory(root, p)
  }

  /** ONE process-wide streaming-checkpoint base: queries point
    * `spark.sql.streaming.checkpointLocation` here and Spark appends the
    * (UUID-unique) query name, so per-call dirs don't accrete a new root
    * each run — accumulation is bounded to this single dir, whose mtime
    * refreshes on every subdir creation (POSIX), keeping a concurrent
    * process's [[cleanStale]] from reclaiming it while it's live. */
  lazy val checkpointBase: String = tempDir("chkbase").toString

  /** Refresh a scratch path's mtime so the 1h [[cleanStale]] horizon never
    * fires on a dir a live process is still reading (memoized fixtures). */
  def touch(path: String): Unit = {
    new File(path).setLastModified(System.currentTimeMillis())
    ()
  }

  def cleanStale(maxAgeMs: Long = 60L * 60 * 1000): Int = {
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val roots = Seq(new File(System.getProperty("java.io.tmpdir")),
      new File("/dev/shm")).filter(_.isDirectory).distinct
    // Staleness is the NEWEST mtime anywhere in the tree, not the top
    // dir's: a live checkpoint tree keeps writing state files nested
    // inside existing query subdirs, which never touches the root's
    // mtime — a top-level-only check deleted a >1h-old LIVE process's
    // checkpoint base out from under it. Scratch trees are small, so the
    // walk is cheap.
    val stale = roots.flatMap(r => Option(r.listFiles()).getOrElse(Array.empty))
      .filter(f => f.isDirectory && f.getName.startsWith("graft") &&
        newestMtime(f) < cutoff)
    stale.foreach(deleteRecursively)
    stale.length
  }

  private def newestMtime(f: File): Long = {
    val own = f.lastModified()
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
      (own +: Option(f.listFiles()).getOrElse(Array.empty)
        .map(newestMtime).toSeq).max
    else own
  }

  private def deleteRecursively(f: File): Unit = {
    // Never FOLLOW a symlink: File.listFiles/isDirectory both traverse
    // links, so recursing into a symlink-to-directory inside a stale
    // scratch dir would delete the TARGET's contents outside the scratch
    // area. Delete the link itself and stop.
    if (!java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
    ()
  }
}
