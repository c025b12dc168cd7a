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
  *     sbt "runMain graft.tools.CcStress [maxHamming]"
  */
object CcStress {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("set SPARK_GRAFT_SF_DIR"))
    val maxHamming = args.headOption.map(_.toInt).getOrElse(1)
    val spark = Sessions.local("graft-cc-stress")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    val nEdges = pairs.count()
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[cc-stress] $label: $n%d rows in ${(System.nanoTime() - t0) / 1e9}%.2f s ($nEdges%d edges)")
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
