package graft.core

import java.io.File

/** Scratch-dir hygiene: queries that exercise sinks (roundtrips, streaming
  * staging/checkpoints) create `graft_*` temp dirs per run; repeated
  * verify/bench invocations would otherwise accrete thousands of them.
  * [[cleanStale]] removes this process's naming-convention dirs older than
  * `maxAgeMs` — the age guard keeps concurrently-running JVMs safe.
  */
object Scratch {

  def cleanStale(maxAgeMs: Long = 60L * 60 * 1000): Int = {
    val tmp = new File(System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val stale = Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("graft") &&
        f.lastModified() < cutoff)
    stale.foreach(deleteRecursively)
    stale.length
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
