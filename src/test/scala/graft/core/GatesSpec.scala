package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The all-twins gate is only as strong as its conf keys actually
  * REACHING their guards: if a key drifted, FORCE_TWINS would set a dead
  * conf, the fast paths would keep running, and the "134/134 all-twins"
  * artifact would certify fallbacks that never executed. Each test sets
  * one Gates.All key to 0 and asserts the operator's PLAN visibly flips
  * to its fallback/materialized shape (outputs are identical by design,
  * so the plan is the only observable). */
class GatesSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(key: String, v: String)(body: => Unit): Unit = {
    spark.conf.set(key, v)
    try body finally spark.conf.unset(key)
  }

  test("effectiveLimit: session conf wins over the call-site default") {
    assert(Gates.effectiveLimit(spark, Gates.ReachDriverEdgeLimit, 42L) == 42L)
    withConf(Gates.ReachDriverEdgeLimit, "7") {
      assert(Gates.effectiveLimit(spark, Gates.ReachDriverEdgeLimit, 42L) == 7L)
    }
  }

  test("dupClusters: zeroing the edge guard forces the distributed path") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    // driver union-find returns a local relation; the distributed
    // propagation is a join/agg pipeline
    val fast = graft.dedup.Dedup.dupClusters(pairs)
    assert(planOf(fast).contains("LocalTableScan"),
      "tiny edge set must take the driver union-find by default")
    withConf(Gates.DedupDriverEdgeLimit, "0") {
      val twin = graft.dedup.Dedup.dupClusters(pairs)
      assert(!planOf(twin).contains("LocalTableScan"),
        "guard=0 must force the distributed label propagation")
      // and the outputs agree
      val a = fast.as[(Long, Long)].collect().toSet
      val b = twin.select(col("id").cast("long"), col("cluster_id").cast("long"))
        .as[(Long, Long)].collect().toSet
      assert(a == b)
    }
  }

  test("shortestHops: zeroing the edge guard forces the recursive path") {
    Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
      .createOrReplaceTempView("gates_edges")
    val fast = graft.operators.Reach.shortestHops(spark, "gates_edges", 0L, 3)
    assert(fast.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "tiny graph must take the driver BFS by default")
    withConf(Gates.ReachDriverEdgeLimit, "0") {
      val twin = graft.operators.Reach.shortestHops(spark, "gates_edges", 0L, 3)
      assert(!twin.queryExecution.executedPlan.toString.contains("LocalTableScan"),
        "guard=0 must force the declarative recursion")
      assert(twin.as[(Long, Int)].collect().toSet ==
        fast.as[(Long, Int)].collect().toSet)
    }
  }

  test("copurchaseLift: zeroing the rescan gate forces the materialization") {
    val rows = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"))
      .toDF("o", "p")
    def hasCheckpointScan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collectLeaves()
        .exists(_.getClass.getSimpleName.contains("LogicalRDD"))
    val fast = graft.analytics.Basket.copurchaseLift(rows, "o", "p", 1L, 1L)
    assert(!hasCheckpointScan(fast),
      "tiny input must rescan, not materialize (the round-7 regression)")
    withConf(Gates.BasketRescanMaxInputBytes, "0") {
      val twin = graft.analytics.Basket.copurchaseLift(rows, "o", "p", 1L, 1L)
      assert(hasCheckpointScan(twin),
        "gate=0 must force the basket-table localCheckpoint")
      assert(twin.collect().toSet.map((r: org.apache.spark.sql.Row) =>
          (r.getString(0), r.getString(1), r.getLong(2))) ==
        fast.collect().toSet.map((r: org.apache.spark.sql.Row) =>
          (r.getString(0), r.getString(1), r.getLong(2))))
    }
  }

  test("pagerank: zeroing the edge guard forces the distributed loop") {
    val edges = Seq((1, 2, 3L), (2, 1, 1L)).toDF("src", "dst", "w")
    val fast = graft.analytics.Graph.pagerank(edges, 2)
    assert(fast.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "tiny graph must take the driver kernel by default")
    withConf(Gates.GraphDriverEdgeLimit, "0") {
      val twin = graft.analytics.Graph.pagerank(edges, 2)
      assert(!twin.queryExecution.executedPlan.toString.contains("LocalTableScan"),
        "guard=0 must force the distributed power iteration")
      assert(twin.as[(Int, Long)].collect().toSet ==
        fast.as[(Int, Long)].collect().toSet)
    }
  }

  test("Ranked: zeroing the small-input gate forces the ranged decomposition") {
    val df = Seq(("a", 2L, 1L), ("a", 1L, 2L), ("b", 5L, 3L))
      .toDF("grp", "v", "id")
    val fast = graft.operators.Ranked.rowNumberRanged(df, Seq("grp"),
      Seq(col("v"), col("id")), "rn")
    assert(!fast.queryExecution.executedPlan.toString.contains("_rr_pid"),
      "tiny input must take the plain window by default")
    withConf(Gates.RankedSmallInputMaxBytes, "0") {
      val twin = graft.operators.Ranked.rowNumberRanged(df, Seq("grp"),
        Seq(col("v"), col("id")), "rn")
      assert(twin.queryExecution.executedPlan.toString.contains("_rr_pid"),
        "gate=0 must force the range-partitioned decomposition")
      assert(twin.select("id", "rn").collect().toSet ==
        fast.select("id", "rn").collect().toSet)
    }
  }
}
