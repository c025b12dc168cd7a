package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction — the janitorial operator every long-running
  * ingest needs (streaming sinks, incremental CDC appends and per-batch
  * upserts all accrete files; a 100 TB table with 10⁷ tiny files spends
  * more time listing than reading).
  *
  * Rewrites a parquet directory into ⌈bytes / targetBytes⌉ files via one
  * round-robin repartition, staging into a sibling temp dir and swapping —
  * the read completes before the target is touched, so a failed rewrite
  * leaves the original intact (write-temp-then-rename, the same discipline
  * as [[graft.streaming.Streams.upsertSink]]'s checkpointed merge).
  *
  * For PARTITIONED layouts, compact each partition's leaf directory — this
  * operator is the per-leaf primitive; compacting across partition
  * boundaries would destroy pruning.
  */
object Compact {

  final case class CompactStats(filesBefore: Int, filesAfter: Int,
                                bytes: Long, partitions: Int)

  /** Rewrite `dir`'s parquet files into ~`targetBytes` files. Returns the
    * before/after accounting. Parquet compresses ~2-4× vs in-memory, so
    * `targetBytes` refers to on-disk (listed) size — the conventional
    * 128 MiB default aligns file and HDFS-block/scan-split size. */
  def compactParquet(spark: SparkSession, dir0: String,
                     targetBytes: Long = 128L * 1024 * 1024): CompactStats = {
    // Normalize a trailing slash FIRST: with "foo/", tmp/old would become
    // "foo/.__compact_tmp" — children of the source itself — and the
    // move-aside rename of foo into its own child fails after the whole
    // rewrite was already paid, leaving the hidden tmp dir inside the
    // table.
    val dir = dir0.replaceAll("/+$", "")
    val before = FsOps.list(spark, dir).filter { case (n, d, _) =>
      !d && n.endsWith(".parquet") }
    require(before.nonEmpty, s"no parquet files under $dir")
    val totalBytes = before.map(_._3).sum
    // Overflow-safe ceil-div: `(total + target - 1)` wraps negative for
    // targetBytes near Long.MaxValue (a legitimate "one file" request),
    // yielding a garbage file count; `(total - 1) / target + 1` stays in
    // range for every total >= 0.
    val n = math.max(1, ((totalBytes - 1) / targetBytes + 1).toInt)
    val tmp = s"$dir.__compact_tmp"
    FsOps.delete(spark, tmp)
    // round-robin repartition: even file sizes regardless of key skew
    spark.read.parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(tmp)
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(hconf)
    val old = s"$dir.__compact_old"
    FsOps.delete(spark, old)
    require(fs.rename(p, new Path(old)), s"could not move $dir aside")
    // The two renames are not one atomic swap: if the promote fails (object
    // stores, permissions, a crash window), roll the original back so the
    // directory never stays missing — the doc's "a failed rewrite leaves
    // the original intact" has to hold on BOTH renames. (Concurrent readers
    // still see a brief gap during a successful swap; compact is an
    // offline/maintenance operation.)
    val promoted = try fs.rename(new Path(tmp), p) catch {
      case e: Throwable =>
        if (!fs.rename(new Path(old), p))
          throw new IllegalStateException(
            s"promote of $tmp failed AND rollback of $old failed — data is in $old", e)
        throw e
    }
    if (!promoted) {
      require(fs.rename(new Path(old), p),
        s"promote of $tmp failed AND rollback of $old failed — data is in $old")
      sys.error(s"could not promote $tmp; original $dir restored")
    }
    FsOps.delete(spark, old)
    val after = FsOps.list(spark, dir).count { case (nm, d, _) =>
      !d && nm.endsWith(".parquet") }
    CompactStats(before.size, after, totalBytes, n)
  }

  /** Leaf partition directories (containing parquet files) under a
    * partitioned table root — the units [[compactParquet]] runs over. */
  def leafPartitions(spark: SparkSession, root: String): Seq[String] = {
    val (children, files) = FsOps.list(spark, root).partition(_._2)
    val here =
      if (files.exists { case (n, _, _) => n.endsWith(".parquet") }) Seq(root)
      else Seq.empty
    here ++ children.map(_._1).filterNot(_.contains("__compact"))
      .flatMap(c => leafPartitions(spark, c))
  }
}
