package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.dedup.Dedup

/** Connected-components scale diagnostic: times [[Dedup.dupClusters]] on
  * the simhash near-dup pair graph of a documents corpus, on BOTH paths —
  * the driver union-find fast path and the distributed min-label
  * propagation (`driverEdgeLimit = 0`, the only path that exists on a real
  * cluster where edges outgrow the driver). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=<dir-with-documents.parquet> \
  *     sbt "runMain graft.tools.CcStress [maxHamming] [maxBucketSize]"
  *
  * `maxBucketSize` (default 1000) caps identical-signature groups before
  * pair expansion — REQUIRED on adversarial corpora: the round-8 30×
  * corpus holds a 7705-doc boilerplate signature group whose uncapped
  * expansion alone is ~30M pairs (59M within-group pairs corpus-wide,
  * heap-OOM at materialization). Production clusters through
  * [[Dedup.simhashComponents]] (sig-level, never doc-pair-sized); this
  * tool materializes doc pairs on purpose to stress [[Dedup.dupClusters]].
  */
object CcStress {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("set SPARK_GRAFT_SF_DIR"))
    val maxHamming = args.headOption.map(_.toInt).getOrElse(1)
    val maxBucket = args.drop(1).headOption.map(_.toInt).getOrElse(1000)
    val spark = Sessions.local("graft-cc-stress")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming,
        maxBucketSize = maxBucket)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    val nEdges = pairs.count()
    // RDD ids pinned by the shared input checkpoint — everything later
    // variants park beyond these is theirs to release.
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[cc-stress] $label: $n%d rows in ${(System.nanoTime() - t0) / 1e9}%.2f s ($nEdges%d edges)")
      // Each dupClusters call localCheckpoints its edge mirror and one
      // label table per round; on a 69M-edge graph three un-released
      // variants exceed the storage pool and the 4th heap-OOMs. Release
      // everything each variant parked — except the shared input pairs
      // (unpersisting a local checkpoint severs its only lineage).
      spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !baseline.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    time("driver union-find (or distributed if > limit)") {
      Dedup.dupClusters(pairs).count()
    }
    for (mi <- Seq(2, 3, 4, 20))
      time(s"distributed propagation maxIter=$mi") {
        Dedup.dupClusters(pairs, maxIter = mi, driverEdgeLimit = 0L).count()
      }
    spark.stop()
  }
}
