package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition of q134's cost after the round-12 kernel
  * single-collect rework: times each stage of the IVF near-dup path in
  * isolation to locate a regression. Not part of the library surface. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.similarity.Similarity

    def quiesce(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    def time(label: String)(body: => Unit): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        body
        val dt = (System.nanoTime() - t0) / 1e9
        quiesce()
        dt
      }
      println(f"[ivf] $label%-34s min=${ts.min}%.3fs all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

    time("centroid_collect") {
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
        .collect()
    }
    time("assign_only_noop") {
      Similarity.ivfAssign(emb, centroids)
        .select(col("vec_id"), col("cluster_id"))
        .write.format("noop").mode("overwrite").save()
    }
    time("neardups_ivf_noop") {
      graft.dedup.Dedup.embeddingNearDupsIvf(emb, centroids, 0.4)
        .write.format("noop").mode("overwrite").save()
    }
    time("q134_full") {
      graft.SparkEntry.queries("q134_semantic_dedup")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
