package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B of the IVF kernel's COLLECT stage shapes (round-12 rework
  * regression hunt). Not part of the library surface. */
object IvfProbe2 {
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
    import spark.implicits._
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
      println(f"[ivf2] $label%-40s min=${ts.min}%.3fs all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def kv(c: org.apache.spark.sql.Column) =
      transform(c, x => coalesce(x.cast("double"), lit(0.0)))
    def keyed(fan: Boolean): DataFrame = {
      val base = if (fan) graft.core.Parallelize.fanOut(emb, 0L) else emb
      Similarity.ivfAssign(base, centroids)
        .select(col("vec_id").cast("long"), col("cluster_id"), kv(col("embedding")))
    }
    def collectIt(df: DataFrame, conf: Boolean): Int = {
      val key = "spark.sql.limit.initialNumPartitions"
      val prev = spark.conf.getOption(key)
      try {
        if (conf) spark.conf.set(key, Int.MaxValue.toString)
        df.na.drop("any").limit(500001).as[(Long, Long, Array[Double])].collect().length
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    time("fanout+conf (shipped)") { collectIt(keyed(fan = true), conf = true) }
    time("fanout, no conf") { collectIt(keyed(fan = true), conf = false) }
    time("no fanout, conf") { collectIt(keyed(fan = false), conf = true) }
    time("no fanout, no conf") { collectIt(keyed(fan = false), conf = false) }
    time("no fanout, no limit plain collect") {
      keyed(fan = false).na.drop("any").as[(Long, Long, Array[Double])].collect()
    }
    time("fanout, no limit plain collect") {
      keyed(fan = true).na.drop("any").as[(Long, Long, Array[Double])].collect()
    }
    spark.stop()
  }
}
