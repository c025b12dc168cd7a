package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ParallelizeSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("small input below minBytes passes through untouched") {
    val df = docs
    // sf0.001 documents is ~64 KB < the 2 MiB default floor: the exchange
    // would cost more than the single task it saves.
    assert(Parallelize.fanOut(df) eq df)
  }

  test("under-partitioned input above the floor fans to cluster parallelism") {
    val out = Parallelize.fanOut(docs, minBytes = 0L)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(out.count() == docs.count())
  }

  test("input estimated to scan with enough partitions passes through") {
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    try {
      // 1 KiB splits -> the ~64 KB file is estimated at ~64 scan partitions,
      // >= defaultParallelism: a 100 TB corpus must never pay this exchange.
      spark.conf.set(key, "1024")
      val df = docs
      assert(Parallelize.fanOut(df, minBytes = 0L) eq df)
    } finally spark.conf.set(key, prev)
  }

  test("fanOut with key columns hash-partitions on those keys") {
    val out = Parallelize.fanOut(docs, 0L, col("lang"))
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("hashpartitioning") || plan.contains("RepartitionByExpression"),
      s"expected a keyed repartition in:\n$plan")
    // same-key rows land in the same partition
    val parts = out.select(col("lang"), spark_partition_id().as("pid"))
      .groupBy("lang").agg(countDistinct(col("pid")).as("np"))
      .agg(max(col("np"))).head().getLong(0)
    assert(parts == 1L)
  }
}
