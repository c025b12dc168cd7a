package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactSpec extends SparkSpec {

  test("compactParquet collapses many small files, data intact, original safe") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").resolve("t").toString
    // 8 tiny files
    (1 to 1000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(8).write.parquet(dir)
    val filesBefore = FsOps.list(spark, dir)
      .count { case (n, d, _) => !d && n.endsWith(".parquet") }
    assert(filesBefore == 8)

    val stats = Compact.compactParquet(spark, dir, targetBytes = Long.MaxValue)
    assert(stats.filesBefore == 8 && stats.filesAfter == 1 && stats.partitions == 1)
    // data round-trips exactly
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.agg(sum(col("id"))).head.getLong(0) == 500500L)
    // no leftover staging dirs
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.contains("__compact")))
  }

  test("compactParquet tolerates a trailing slash on the directory") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_compact_slash")
    val dir = s"$base/t"
    (1 to 4).foreach(i => Seq((i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir))
    // with "t/", tmp/old used to become CHILDREN of the table and the
    // move-aside rename failed after the full rewrite was already paid
    val stats = Compact.compactParquet(spark, dir + "/",
      targetBytes = Long.MaxValue)
    assert(stats.filesAfter < stats.filesBefore)
    assert(spark.read.parquet(dir).count() == 4L)
  }

  test("leafPartitions finds each partition dir of a partitioned table") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_compact_part").resolve("t").toString
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "p")
      .write.partitionBy("p").parquet(root)
    val leaves = Compact.leafPartitions(spark, root).sorted
    assert(leaves.size == 2)
    assert(leaves.exists(_.endsWith("p=a")) && leaves.exists(_.endsWith("p=b")))
    // compacting one leaf keeps the partitioned table readable with pruning
    Compact.compactParquet(spark, leaves.head, targetBytes = Long.MaxValue)
    assert(spark.read.parquet(root).count() == 3)
  }
}

class PartitionPruningSpec extends SparkSpec {

  test("partition filters prune the scan to matching directories only") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_prune").resolve("t").toString
    (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "click" else "view"))
      .toDF("id", "etype").write.partitionBy("etype").parquet(root)
    val q = spark.read.parquet(root).filter(col("etype") === "click")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "expected partition filters in scan")
    assert("PartitionFilters: \\[[^\\]]*etype[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      s"etype filter not pushed to partition pruning:\n$plan")
    assert(q.count() == 50)
    // the data filter list must NOT contain etype (it is pruned, not scanned)
    val dataFilters = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(!dataFilters.contains("etype"))
  }
}
