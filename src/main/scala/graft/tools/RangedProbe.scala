package graft.tools

import org.apache.spark.sql.functions._

/** Round-12: is the elevated Ranked-consumer floor driven by the range
  * count (task count + sampling width), the sampling pass itself, or
  * neither? Times q72's ranked core at several range counts plus a plain
  * window reference. Scratch tooling. */
object RangedProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("graft-ranged-probe")
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.core.Tables.load(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("event_id"))

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[rangedprobe] $label min=${ts.min}%.2fs all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    Seq(64, 32, 16, 8).foreach { r =>
      time(s"rowNumberRanged ranges=$r") {
        graft.operators.Ranked.rowNumberRanged(base, Seq("event_type"),
          Seq(col("value"), col("event_id")), "rn", r)
      }
    }
    time("plain window (the cliff)") {
      base.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))))
    }
    spark.stop()
  }
}
