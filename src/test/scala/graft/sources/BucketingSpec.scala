package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("co-located join of same-bucketed tables plans without any Exchange") {
    val base = Files.createTempDirectory("graft_bucket").toString
    val orders = graft.core.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = graft.core.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

    Bucketing.writeBucketed(orders, "b_orders", s"$base/b_orders",
      Seq("o_orderkey"), numBuckets = 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", s"$base/b_lineitem",
      Seq("o_orderkey"), numBuckets = 4)
    try {
      val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem",
        Seq("o_orderkey"))
      // disable auto-broadcast so the join strategy is the bucketed SMJ,
      // then assert the whole plan is exchange-free
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val plan = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem",
          Seq("o_orderkey")).queryExecution.executedPlan
        val planStr = plan.toString
        assert(!planStr.contains("Exchange"),
          s"bucketed join must not shuffle:\n${planStr.take(2000)}")
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      // and it computes the right thing
      val expected = orders.join(lineitem, Seq("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
