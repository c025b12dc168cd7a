package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe: q01's decimal-sum aggregation vs a long-cents (quantize-
  * once) restatement vs the bare scan. Diagnostic only.
  */
object Q01Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[probe] $label ${times.min}%.2fs (min of 3)")
    }
    val li = graft.core.Tables.load(s, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    def cents(c: org.apache.spark.sql.Column) =
      floor(c * 100 + 0.5).cast("long")
    time("scan-only count") {
      li.select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
        .write.format("noop").mode("overwrite").save()
    }
    time("decimal sums (current q01)") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .write.format("noop").mode("overwrite").save()
    }
    time("cents rows, decimal(38,0) sums") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg((sum(cents(col("l_quantity")).cast("decimal(38,0)")).cast("double") / 100.0).as("sum_qty"),
          (sum(cents(col("l_extendedprice")).cast("decimal(38,0)")).cast("double") / 100.0).as("sum_base_price"),
          (sum((cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).cast("decimal(38,0)"))
            .cast("double") / 10000.0).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .write.format("noop").mode("overwrite").save()
    }
    time("long-cents sums") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg((sum(cents(col("l_quantity"))).cast("double") / 100.0).as("sum_qty"),
          (sum(cents(col("l_extendedprice"))).cast("double") / 100.0).as("sum_base_price"),
          (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
            .cast("double") / 10000.0).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
