package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with active-session reuse and sane local-mode defaults.
  *
  * Re-expresses the reference's `get_or_create_spark_session` +
  * `revise_shuffle_partitions` (reference: src/com/vitthalmirji/utils/spark.py:11-53,
  * 105-116) Spark-first: AQE is enabled so runtime coalescing/skew handling
  * supersedes the reference's manual `executors × cores × multiplier` formula,
  * which we keep only as the *initial* shuffle-partition count.
  */
object Sessions {

  /** Default core count: env override, else all local processors. */
  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  /** Build (or reuse) a local session tuned for this engine.
    *
    * - shuffle partitions sized to cores (not the 200 default) — AQE then
    *   coalesces small post-shuffle partitions at runtime;
    *   at cluster scale the same code takes partitions from the submit conf.
    * - UTC session timezone for cross-engine (DuckDB-oracle) parity.
    */
  def local(appName: String = "graft",
            cores: Int = defaultCores,
            shufflePartitions: Option[Int] = None,
            extraConf: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      // engine extensions (custom SQL functions + TopK strategy/rule); on a
      // cluster the same class rides --conf spark.sql.extensions
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.getOrElse(cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Reference parity: shuffle partitions = executors × cores × multiplier
    * (reference: utils/spark.py:105-116). Kept as an explicit knob; AQE
    * normally makes this unnecessary.
    */
  def reviseShufflePartitions(spark: SparkSession, executors: Int, cores: Int,
                              multiplier: Int = 1): Unit =
    spark.conf.set("spark.sql.shuffle.partitions", (executors * cores * multiplier).toString)
}
