package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q103 cost decomposition (round-11 judge ask): is the residual gap vs
  * DuckDB (0.60s vs 0.34s warm, round 10) the md5 kernel, the canonical
  * string build, or the agg? Times each pipeline stage cumulatively on the
  * q103 input (lineitem, 6 columns) so the per-stage increment is the
  * stage's cost.
  */
object Q103Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.ColumnOps

    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus")
    def li = graft.core.Tables.load(spark, sfDir, "lineitem")
      .select(cols.map(col): _*)

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-34s min=${ts.min}%.3fs  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    time("0 scan+count")(li.agg(count(lit(1))))
    time("1 +canonical string")(
      li.select(ColumnOps.canonicalJoined(cols.map(col)).as("s"))
        .agg(sum(length(col("s")))))
    time("2 +md5 hex (builtin)")(
      li.select(md5(ColumnOps.canonicalJoined(cols.map(col))).as("h"))
        .agg(sum(length(col("h")))))
    time("3 +prefix48 kernel")(
      li.select(graft.functions.Md5Prefix.prefix48(
          ColumnOps.canonicalJoined(cols.map(col))).as("h"))
        .agg(sum(col("h").bitwiseAND(lit(0xffffL))))) // limb: no long overflow
    time("4 full q103 (grouped limb)")(
      graft.quality.Checksums.grouped(
        graft.core.Tables.load(spark, sfDir, "lineitem"),
        Seq("l_returnflag"), cols))
    spark.stop()
  }
}
