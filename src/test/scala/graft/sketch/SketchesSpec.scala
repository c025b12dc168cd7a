package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Error-bound assertions for the sketch surface against exact answers on
  * the driver tables — the contract a sketch user relies on (estimates
  * within the advertised bounds; merged sketches equal to whole-data
  * sketches in accuracy).
  */
class SketchesSpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, sf, "orders")

  test("HLL approx distinct within 5% of exact, per group") {
    val exact = orders.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxDistinct(orders, Seq("o_orderpriority"), "o_custkey")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(2.0, 0.05 * n),
        s"group $k: exact $n approx ${approx(k)}")
    }
  }

  test("merged day-grain HLL sketches match whole-data estimate") {
    val withDay = orders.withColumn("d", dayofmonth(col("o_orderdate")))
    val daily = Sketches.distinctSketches(withDay, Seq("o_orderpriority", "d"), "o_custkey")
    val merged = Sketches.mergeDistinct(daily, Seq("o_orderpriority"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val whole = Sketches.approxDistinct(orders, Seq("o_orderpriority"), "o_custkey")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    whole.foreach { case (k, w) =>
      assert(math.abs(merged(k) - w) <= math.max(2.0, 0.02 * w),
        s"group $k: whole $w merged ${merged(k)}")
    }
  }

  test("count-min estimate bounds: >= true count, <= true + eps*N") {
    val cms = Sketches.countMin(orders, "o_orderpriority", eps = 0.01)
    val n = orders.count()
    val truth = orders.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c && est <= c + (0.01 * n).toLong + 1,
        s"key $k: true $c est $est n $n")
    }
  }

  test("approx quantiles land within rank tolerance of exact") {
    val qs = Seq(0.25, 0.5, 0.75)
    val approx = Sketches.approxQuantiles(orders.withColumn("g", lit(1)),
        Seq("g"), "o_totalprice", qs)
      .head.getSeq[Double](1)
    val exact = orders.stat.approxQuantile("o_totalprice", qs.toArray, 0.0)
    // compare by rank displacement, not value: |rank(approx) - target| small
    val n = orders.count().toDouble
    qs.indices.foreach { i =>
      val rank = orders.where(col("o_totalprice") <= approx(i)).count() / n
      assert(math.abs(rank - qs(i)) < 0.01,
        s"p=${qs(i)}: approx ${approx(i)} (rank $rank) exact ${exact(i)}")
    }
  }

  test("HLL Jaccard estimate tracks exact Jaccard on overlapping sets") {
    import spark.implicits._
    val a = (1 to 2000).toDF("v")
    val b = (1001 to 3000).toDF("v")
    // exact: |∩| = 1000, |∪| = 3000
    val est = Sketches.jaccardEstimate(a, b, "v")
    val v = a.sparkSession.range(1).select(est).head.getDouble(0)
    assert(math.abs(v - 1000.0 / 3000.0) < 0.05, s"estimate $v")
  }

  test("HLL Jaccard is 0 on empty inputs and always lands in [0, 1]") {
    import spark.implicits._
    val empty = Seq.empty[Int].toDF("v")
    val e = spark.range(1)
      .select(Sketches.jaccardEstimate(empty, empty, "v")).head.getDouble(0)
    assert(e == 0.0, s"empty union must be 0.0, not NaN: $e") // was 0/0=NaN
    val a = (1 to 500).toDF("v")
    val b = (100001 to 100500).toDF("v") // disjoint: estimator error could
    val d = spark.range(1)               // push inclusion-exclusion < 0
      .select(Sketches.jaccardEstimate(a, b, "v")).head.getDouble(0)
    assert(d >= 0.0 && d <= 1.0, s"clamped similarity, got $d")
    // ONE empty side: its conditional sketch aggregates to NULL — must
    // read as 0 distinct (J = 0), not a driver NPE
    val half = spark.range(1)
      .select(Sketches.jaccardEstimate(a, empty, "v")).head.getDouble(0)
    assert(half == 0.0, s"A vs empty must be 0.0, got $half")
  }
}
