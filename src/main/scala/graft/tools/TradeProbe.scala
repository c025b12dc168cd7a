package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r13 probe (verdict ask #6): the 4-table tradeEdges derivation shared by
  * q112/q113 — join order and broadcast structure, guide §3.
  *
  *  V0 (shipped): lineitem ⋈ orders ⋈ customer ⋈ supplier → filter → agg
  *  V1: customer nation attached to ORDERS first (orders ⋈ customer is the
  *      small join), then lineitem ⋈ that ⋈ supplier → filter → agg —
  *      lineitem flows through one fewer wide join stage.
  *  V2: V1 + early projection to the exact join/agg columns.
  *
  * Same-session alternating, min-of-N, parity asserted. */
object TradeProbe {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Tables.load(s, dir, name)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = graft.core.Sessions.local("trade-probe")

    def v0(): DataFrame =
      t(spark, dir, "lineitem")
        .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))

    def v1(): DataFrame = {
      val orderNation = t(spark, dir, "orders")
        .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      t(spark, dir, "lineitem")
        .join(orderNation, col("l_orderkey") === col("o_orderkey"))
        .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
    }

    def v2(): DataFrame = {
      val orderNation = t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        .join(orderNation, col("l_orderkey") === col("o_orderkey"))
        .join(t(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
    }

    val shapes = Seq("v0" -> v0 _, "v1" -> v1 _, "v2" -> v2 _)
    def time(tag: String, fn: () => DataFrame): Double = {
      spark.sparkContext.setJobDescription(s"trade $tag")
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    shapes.foreach { case (n, f) => time(s"warm $n", f) }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (r <- 1 to reps; (n, f) <- shapes)
      acc(n) = acc(n) :+ time(s"$n rep$r", f)
    shapes.foreach { case (n, _) =>
      val v = acc(n)
      println(f"$n min ${v.min}%.3f reps ${v.map(x => f"$x%.2f").mkString(" ")}")
    }
    val r0 = v0().collect().map(_.toSeq).toSet
    println(s"parity v1=${v1().collect().map(_.toSeq).toSet == r0} " +
      s"v2=${v2().collect().map(_.toSeq).toSet == r0} (${r0.size} rows)")
    spark.stop()
    sys.exit(0)
  }
}
