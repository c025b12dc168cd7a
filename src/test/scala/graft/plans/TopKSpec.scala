package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.core.Tables

/** The custom per-key top-k operator: result equivalence with the window
  * row_number formulation (the semantics contract), physical shape (partial
  * + final with one exchange between), bounded partial output, and the
  * key-filter pushdown rule.
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def topkDf = TopK.perKey(
    Tables.load(spark, sf, "orders"),
    keys = Seq("o_custkey"),
    orderBy = Seq(("o_totalprice", false), ("o_orderkey", true)), k = 3)

  test("matches the row_number window formulation exactly") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = Tables.load(spark, sf, "orders")
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3).drop("rn")
      .select("o_orderkey").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq
    val got = topkDf.select("o_orderkey").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq
    assert(got == expected)
  }

  private def physical(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }

  test("plans as partial + final TopKPerKeyExec with one exchange between") {
    val plan = physical(topkDf)
    val execs = plan.collect { case t: TopK.TopKPerKeyExec => t }
    assert(execs.map(_.partial).sorted == Seq(false, true))
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(exchanges.size == 1)
    // the exchange must sit between final (above) and partial (below)
    val finalNode = execs.find(!_.partial).get
    assert(finalNode.collect { case t: TopK.TopKPerKeyExec if t.partial => t }.nonEmpty)
  }

  test("partial phase bounds rows shipped to k per key per partition") {
    import spark.implicits._
    // one hot key, 1000 rows, 4 input partitions → partial emits ≤ 4k rows
    val hot = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "v").repartition(4)
    val out = TopK.perKey(hot, Seq("k"), Seq(("v", true)), 3)
    val partialRows = physical(out).collect {
      case t: TopK.TopKPerKeyExec if t.partial => t
    }.head.execute().count()
    assert(partialRows <= 12, s"partial emitted $partialRows rows")
    // and the final result is the global minimum 3
    assert(out.select("v").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("key-only filters push through the top-k node") {
    val filtered = topkDf.where(col("o_custkey") === 7L)
    val optimized = filtered.queryExecution.optimizedPlan
    // after pushdown the Filter must NOT sit directly above TopKPerKeyNode
    val topAboveFilter = optimized.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.child.isInstanceOf[TopK.TopKPerKeyNode] => f
    }
    assert(topAboveFilter.isEmpty, "key filter was not pushed through top-k")
    // semantics preserved: equals filtering the window formulation
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = Tables.load(spark, sf, "orders")
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .where(col("o_custkey") === 7L)
      .select("o_orderkey").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq
    val got = filtered.select("o_orderkey").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted.toSeq
    assert(got == expected)
  }

  test("non-key filters do NOT push through (they would change results)") {
    val filtered = topkDf.where(col("o_totalprice") > 100.0)
    val optimized = filtered.queryExecution.optimizedPlan
    val topk = optimized.collect { case t: TopK.TopKPerKeyNode => t }.head
    // the value filter must remain above: the top-k child is not a Filter
    // on o_totalprice
    assert(!topk.child.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter])
  }

  test("filters on a DERIVED key's inputs do not push through (unsound)") {
    import org.apache.spark.sql.catalyst.expressions.{GreaterThan, Literal, Pmod}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    // Key = o_custkey % 2 — a filter on o_custkey removes group MEMBERS,
    // not whole groups, so pushing it below the top-k changes which rows
    // win. The old rule accepted it because the derived key REFERENCED
    // the attribute.
    val plan = Tables.load(spark, sf, "orders").queryExecution.analyzed
    val cust = plan.output.find(_.name == "o_custkey").get
    val node = TopK.TopKPerKeyNode(
      Seq(Pmod(cust, Literal(2L))),
      Seq(org.apache.spark.sql.catalyst.expressions.SortOrder(cust,
        org.apache.spark.sql.catalyst.expressions.Ascending)),
      1, plan)
    val filtered = Filter(GreaterThan(cust, Literal(5L)), node)
    val after = TopK.PushFilterThroughTopK(filtered)
    assert(after match {
      case Filter(_, _: TopK.TopKPerKeyNode) => true
      case _ => false
    }, s"filter on derived-key input must stay above the top-k: $after")
  }

  test("float keys: -0.0 and 0.0 are one group, like the window formulation") {
    import spark.implicits._
    // The custom node sits outside NormalizeFloatingNumbers; without
    // normalized key projections the two zero encodings hashed apart and
    // one logical group emitted up to 2k rows.
    val df = Seq((-0.0, 1.0), (0.0, 2.0), (1.5, 3.0)).toDF("x", "v")
    val got = TopK.perKey(df, Seq("x"), Seq(("v", false)), 1)
      .collect().map(_.getDouble(1)).sorted.toSeq
    assert(got == Seq(2.0, 3.0), s"one row per logical key, got $got")
  }
}
