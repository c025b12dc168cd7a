package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sessions

/** q111 design-variant timing harness (round 8). Compares the shipped
  * [[graft.analytics.Basket.copurchaseLift]] against candidate plan shapes
  * on the bench table, min-of-N each, and cross-checks row counts so a
  * faster variant can't silently change semantics. Scratch tooling — not
  * part of the library surface.
  */
object BasketBench {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = Sessions.local("graft-basket-bench")
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.core.Tables.load(spark, dir, "lineitem")

    def quiesce(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    def time(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = mk
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        quiesce()
        dt
      }
      val n = mk.count()
      quiesce()
      println(f"[basket] $label min=${ts.min}%.2fs all=${ts.map(t => f"$t%.2f").mkString(",")} rows=$n")
    }

    time("A_shipped") {
      graft.analytics.Basket.copurchaseLift(li, "l_orderkey", "l_partkey", 5, 2)
    }

    def reuseReport(label: String, df: DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // finalize AQE stages
      val plan = df.queryExecution.executedPlan.toString
      println(s"[basket] $label post-exec ReusedQueryStage=" +
        "ReusedQueryStage".r.findAllIn(plan).size +
        " ReusedExchange=" + "ReusedExchange".r.findAllIn(plan).size +
        " ShuffleQueryStage=" + "ShuffleQueryStage".r.findAllIn(plan).size +
        " HashAggregate=" + "HashAggregate".r.findAllIn(plan).size +
        " ObjectHashAggregate=" + "ObjectHashAggregate".r.findAllIn(plan).size)
    }

    // B: distinct(o,p) cached once; pairs via co-partitioned self-join.
    time("B_selfjoin") {
      val dist = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .repartition(col("o")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = dist.as("a").join(dist.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
        .agg(count(lit(1)).as("n_ab"))
        // pair support 2 = A_shipped's minPairSupport (was 5: the variant
        // timed a semantically different, smaller query than the baseline)
        .where(col("n_ab") >= 2)
      val item = dist.groupBy(col("p")).agg(count(lit(1)).as("n"))
        .where(col("n") >= 5)
      val nOrders = dist.select(col("o")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      pairs
        .join(broadcast(item.select(col("p").as("pa"), col("n").as("n_a"))), "pa")
        .join(broadcast(item.select(col("p").as("pb"), col("n").as("n_b"))), "pb")
        .crossJoin(broadcast(nOrders))
        .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
          expr("cast(n_ab as decimal(38,0)) * n_orders * 1000000" +
            " div (cast(n_a as decimal(38,0)) * n_b)").as("lift_ppm"))
    }

    // C: shipped shape but NO persist (let Catalyst slice/recompute).
    time("C_nopersist") {
      val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .repartition(col("o"))
      val baskets = op.groupBy(col("o"))
        .agg(sort_array(collect_set(col("p"))).as("items"))
      val pairRows = baskets
        .select(col("items"), posexplode(col("items")).as(Seq("ki", "ka")))
        .select(col("ka"),
          explode(expr("slice(items, ki + 2, size(items) - ki - 1)")).as("kb"))
      val dist = op.groupBy(col("o"), col("p")).agg(count(lit(1)).as("cnt"))
      val itemRows = dist.select(col("p").as("ka"), lit(null).cast("bigint").as("kb"))
      val markerRows = dist.where(col("cnt") > 0)
        .groupBy(col("o")).agg(count(lit(1)))
        .select(lit(null).cast("bigint").as("ka"), lit(null).cast("bigint").as("kb"))
      val agg = pairRows.unionAll(itemRows.unionAll(markerRows))
        .groupBy(col("ka"), col("kb")).agg(count(lit(1)).as("n"))
      val pairs = agg.where(col("ka").isNotNull && col("kb").isNotNull && col("n") >= 2)
        .select(col("ka").as("pa"), col("kb").as("pb"), col("n").as("n_ab"))
      val item = agg.where(col("ka").isNotNull && col("kb").isNull && col("n") >= 5)
      val nOrders = agg.where(col("ka").isNull).select(col("n").as("n_orders"))
      val out = pairs
        .join(broadcast(item.select(col("ka").as("pa"), col("n").as("n_a"))), "pa")
        .join(broadcast(item.select(col("ka").as("pb"), col("n").as("n_b"))), "pb")
        .crossJoin(broadcast(nOrders))
        .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
          expr("cast(n_ab as decimal(38,0)) * n_orders * 1000000" +
            " div (cast(n_a as decimal(38,0)) * n_b)").as("lift_ppm"))
      out
    }

    // D: shipped shape, order count collected as a scalar action on the
    // cached aggregate's input side (no marker rows through the union).
    time("D_scalar_orders") {
      val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .repartition(col("o"))
      val dist = op.groupBy(col("o"), col("p")).agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nOrders = dist.select(col("o")).distinct().count()
      val baskets = dist.groupBy(col("o"))
        .agg(sort_array(collect_set(col("p"))).as("items"))
      val pairRows = baskets
        .select(col("items"), posexplode(col("items")).as(Seq("ki", "ka")))
        .select(col("ka"),
          explode(expr("slice(items, ki + 2, size(items) - ki - 1)")).as("kb"))
      val pairs = pairRows.groupBy(col("ka"), col("kb"))
        .agg(count(lit(1)).as("n_ab")).where(col("n_ab") >= 2) // = A's minPairSupport
        .select(col("ka").as("pa"), col("kb").as("pb"), col("n_ab"))
      val item = dist.groupBy(col("p")).agg(count(lit(1)).as("n"))
        .where(col("n") >= 5)
      pairs
        .join(broadcast(item.select(col("p").as("pa"), col("n").as("n_a"))), "pa")
        .join(broadcast(item.select(col("p").as("pb"), col("n").as("n_b"))), "pb")
        .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
          expr(s"cast(n_ab as decimal(38,0)) * $nOrders * 1000000" +
            " div (cast(n_a as decimal(38,0)) * n_b)").as("lift_ppm"))
    }

    // E: no union, no persist — three direct consumers of the same
    // repartition(o) subtree; AQE exchange reuse shares the shuffle.
    time("E_direct") {
      val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .repartition(col("o"))
      val dist = op.groupBy(col("o"), col("p")).agg(count(lit(1)).as("cnt"))
      val baskets = dist.groupBy(col("o"))
        .agg(sort_array(collect_set(col("p"))).as("items"))
      val pairRows = baskets
        .select(col("items"), posexplode(col("items")).as(Seq("ki", "ka")))
        .select(col("ka"),
          explode(expr("slice(items, ki + 2, size(items) - ki - 1)")).as("kb"))
      val pairs = pairRows.groupBy(col("ka"), col("kb"))
        .agg(count(lit(1)).as("n_ab")).where(col("n_ab") >= 2)
        .select(col("ka").as("pa"), col("kb").as("pb"), col("n_ab"))
      val item = dist.groupBy(col("p")).agg(count(lit(1)).as("n"))
        .where(col("n") >= 5)
      val nOrders = dist.select(col("o")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      val out = pairs
        .join(broadcast(item.select(col("p").as("pa"), col("n").as("n_a"))), "pa")
        .join(broadcast(item.select(col("p").as("pb"), col("n").as("n_b"))), "pb")
        .crossJoin(broadcast(nOrders))
        .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
          expr("cast(n_ab as decimal(38,0)) * n_orders * 1000000" +
            " div (cast(n_a as decimal(38,0)) * n_b)").as("lift_ppm"))
      out
    }

    // F: judge-suggested round-12 shape — item supports and the order
    // count both derive from the BASKETS arm (explode of items /
    // count(1) over the grouped result) instead of separate passes over
    // the distinct projection.
    def fromBaskets(): DataFrame = {
      val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .repartition(col("o"))
      val baskets = op.groupBy(col("o"))
        .agg(sort_array(collect_set(col("p"))).as("items"))
      val pairRows = baskets
        .select(col("items"), posexplode(col("items")).as(Seq("ki", "ka")))
        .select(col("ka"),
          explode(expr("slice(items, ki + 2, size(items) - ki - 1)")).as("kb"))
      val pairs = pairRows.groupBy(col("ka"), col("kb"))
        .agg(count(lit(1)).as("n_ab")).where(col("n_ab") >= 2)
        .select(col("ka").as("pa"), col("kb").as("pb"), col("n_ab"))
      val item = baskets.select(explode(col("items")).as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("n"))
        .where(col("n") >= 5)
      val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
      pairs
        .join(broadcast(item.select(col("p").as("pa"), col("n").as("n_a"))), "pa")
        .join(broadcast(item.select(col("p").as("pb"), col("n").as("n_b"))), "pb")
        .crossJoin(broadcast(nOrders))
        .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
          expr("cast(n_ab as decimal(38,0)) * n_orders * 1000000" +
            " div (cast(n_a as decimal(38,0)) * n_b)").as("lift_ppm"))
    }
    time("F_from_baskets")(fromBaskets())
    reuseReport("F_from_baskets", fromBaskets())

    // H: ONE generator pass emits both item rows (kb NULL, prepended to
    // each outer position's slice) and pair rows; one groupBy(ka, kb)
    // yields pair counts AND item supports, and the order count falls out
    // of the same aggregate as sum over item groups of "basket's first
    // item" markers — no second pass over the distinct projection at all.
    def unified(checkpointCounts: Boolean): DataFrame = {
      val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .repartition(col("o"))
      val baskets = op.groupBy(col("o"))
        .agg(sort_array(collect_set(col("p"))).as("items"))
      val rows = baskets
        .select(col("items"), posexplode(col("items")).as(Seq("ki", "ka")))
        .select(col("ka"), col("ki"),
          explode(concat(array(lit(null).cast("bigint")),
            expr("slice(items, ki + 2, size(items) - ki - 1)"))).as("kb"))
      val counts0 = rows.groupBy(col("ka"), col("kb"))
        .agg(count(lit(1)).as("n"),
          count(when(col("ki") === 0 && col("kb").isNull, lit(1))).as("f0"))
      val counts = if (checkpointCounts) counts0.localCheckpoint() else counts0
      val pairs = counts.where(col("kb").isNotNull && col("n") >= 2)
        .select(col("ka").as("pa"), col("kb").as("pb"), col("n").as("n_ab"))
      val item = counts.where(col("kb").isNull && col("n") >= 5)
      val nOrders = counts.where(col("kb").isNull)
        .agg(sum(col("f0")).as("n_orders"))
      pairs
        .join(broadcast(item.select(col("ka").as("pa"), col("n").as("n_a"))), "pa")
        .join(broadcast(item.select(col("ka").as("pb"), col("n").as("n_b"))), "pb")
        .crossJoin(broadcast(nOrders))
        .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
          expr("cast(n_ab as decimal(38,0)) * n_orders * 1000000" +
            " div (cast(n_a as decimal(38,0)) * n_b)").as("lift_ppm"))
    }
    time("H_unified")(unified(checkpointCounts = false))
    time("I_unified_ckpt")(unified(checkpointCounts = true))

    // late-position re-runs: run order biases the early variants (JIT,
    // classload); a winner must beat the incumbent in BOTH positions.
    time("A_late") {
      graft.analytics.Basket.copurchaseLift(li, "l_orderkey", "l_partkey", 5, 2)
    }
    reuseReport("A_late", graft.analytics.Basket.copurchaseLift(
      li, "l_orderkey", "l_partkey", 5, 2))

    spark.stop()
  }
}
