package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the pair-kernel's limit-bounded driver collect (round 11):
  * times `limit(max+1).collect()` (CollectLimitExec's incremental partition
  * fetch) against a plain `collect()` on the q134-shaped IVF kernel input,
  * to decide whether the TOCTOU bound costs measurable hot-path time.
  */
object CollectProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.similarity.Similarity

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val k = Similarity.ivfAssign(graft.core.Parallelize.fanOut(emb, 0L),
        centroids, "vec_id", "embedding")
      .select(col("vec_id").cast("long"), col("cluster_id"),
        transform(col("embedding"), x => coalesce(x.cast("double"), lit(0.0))))
      .localCheckpoint(true)
      .na.drop("any")

    def time(label: String)(f: => Int): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-28s min=${ts.map(_._1).min}%.3fs  all=${ts.map(t => f"${t._1}%.3f").mkString(",")}  rows=${ts.head._2}")
    }
    time("plain collect") { k.as[(Long, Long, Array[Double])].collect().length }
    time("limit(500001) collect") { k.limit(500001).as[(Long, Long, Array[Double])].collect().length }
    spark.stop()
  }
}
