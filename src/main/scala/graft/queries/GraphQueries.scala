package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.{Basket, Graph}
import graft.core.Tables

/** Graph + market-basket pack: co-purchase lift with A-priori support
  * pruning, triangle enumeration, and all-integer PageRank — the join-
  * expressible graph shapes, hash-gated against DuckDB restatements
  * (PageRank unrolled per-iteration in the oracle SQL, identical integer
  * division at every step).
  */
object GraphQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Nation-level trade digraph: customer nation → supplier nation, edge
    * weight = lineitem count (the q97 derivation, DataFrame-side). */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .where(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Co-purchase lift: parts bought together in one order vs independence.
    // Items below support 5 are pruned BEFORE the basket self-join
    // (downward closure), pairs below support 2 after; lift in exact ppm.
    "q111_copurchase_lift" -> ((s, dir) =>
      Basket.copurchaseLift(t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minItemSupport = 5L, minPairSupport = 2L)),

    // Triangles of the top-3-per-source heaviest trade edges, undirected:
    // two hash joins under a u<v<w constraint enumerate each exactly once.
    "q112_trade_triangles" -> ((s, dir) => {
      val heavy = tradeEdges(s, dir)
        .withColumn("r", row_number().over(
          Window.partitionBy(col("src"))
            .orderBy(col("w").desc, col("dst").asc)))
        .where(col("r") <= 3).select(col("src"), col("dst"))
      Graph.triangles(heavy)
        .select(col("u").cast("int").as("u"), col("v").cast("int").as("v"),
          col("w").cast("int").as("w"))
    }),

    // PageRank, 3 power iterations over the full trade digraph — ranks in
    // integer ppm with fixed-shape integer division, so the oracle's
    // unrolled iterations reproduce every truncation bit-for-bit.
    "q113_pagerank" -> ((s, dir) =>
      Graph.pagerank(tradeEdges(s, dir), iters = 3)
        .select(col("node").cast("long").as("node"),
          col("pr_ppm").cast("long").as("pr_ppm")))
  )

  /** DuckDB restatement of [[tradeEdges]] — ONE definition for both graph
    * oracles, so the Spark helper and the SQL derivation can't drift apart
    * per-query. */
  private val tradeEdgesSql: String =
    """SELECT c.c_nationkey AS src, sp.s_nationkey AS dst, COUNT(*) AS w
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier sp ON l.l_suppkey = sp.s_suppkey
      |  WHERE c.c_nationkey <> sp.s_nationkey
      |  GROUP BY 1, 2""".stripMargin

  val oracles: Map[String, String] = Map(

    "q111_copurchase_lift" ->
      """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |item AS MATERIALIZED (SELECT p, COUNT(*) AS n FROM op GROUP BY 1 HAVING COUNT(*) >= 5),
        |no AS (SELECT COUNT(DISTINCT o) AS n_orders FROM op),
        |pairs AS (
        |  SELECT a.p AS pa, b.p AS pb, ia.n AS n_a, ib.n AS n_b,
        |    COUNT(*) AS n_ab
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  JOIN item ia ON ia.p = a.p JOIN item ib ON ib.p = b.p
        |  GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= 2)
        |SELECT pa, pb, n_ab, n_a, n_b,
        |  CAST((CAST(n_ab AS HUGEINT) * n_orders * 1000000)
        |    // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS lift_ppm
        |FROM pairs CROSS JOIN no""".stripMargin,

    "q112_trade_triangles" ->
      s"""WITH e AS MATERIALIZED (
        |$tradeEdgesSql),
        |heavy AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT src, dst, row_number() OVER (
        |      PARTITION BY src ORDER BY w DESC, dst ASC) AS r FROM e)
        |  WHERE r <= 3),
        |und AS MATERIALIZED (
        |  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        |  FROM heavy WHERE src <> dst)
        |SELECT CAST(a.u AS INT) AS u, CAST(a.v AS INT) AS v,
        |  CAST(b.v AS INT) AS w
        |FROM und a JOIN und b ON a.v = b.u JOIN und c
        |  ON c.u = a.u AND c.v = b.v""".stripMargin,

    "q113_pagerank" ->
      s"""WITH e0 AS MATERIALIZED (
        |$tradeEdgesSql),
        |outw AS MATERIALIZED (SELECT src, SUM(w) AS outw FROM e0 GROUP BY 1),
        |e AS MATERIALIZED (SELECT e0.src, e0.dst, e0.w, outw.outw
        |      FROM e0 JOIN outw USING (src)),
        |nodes AS MATERIALIZED (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
        |n AS MATERIALIZED (SELECT COUNT(*) AS nn FROM nodes),
        |p0 AS MATERIALIZED (SELECT node, 1000000 // nn AS pr FROM nodes CROSS JOIN n),
        |c1 AS MATERIALIZED (SELECT dst AS node,
        |         SUM((850 * pr * w) // (1000 * outw)) AS inflow
        |       FROM e JOIN p0 ON e.src = p0.node GROUP BY 1),
        |p1 AS MATERIALIZED (SELECT nodes.node, 150000 // nn + COALESCE(inflow, 0) AS pr
        |       FROM nodes CROSS JOIN n LEFT JOIN c1 ON c1.node = nodes.node),
        |c2 AS MATERIALIZED (SELECT dst AS node,
        |         SUM((850 * pr * w) // (1000 * outw)) AS inflow
        |       FROM e JOIN p1 ON e.src = p1.node GROUP BY 1),
        |p2 AS MATERIALIZED (SELECT nodes.node, 150000 // nn + COALESCE(inflow, 0) AS pr
        |       FROM nodes CROSS JOIN n LEFT JOIN c2 ON c2.node = nodes.node),
        |c3 AS MATERIALIZED (SELECT dst AS node,
        |         SUM((850 * pr * w) // (1000 * outw)) AS inflow
        |       FROM e JOIN p2 ON e.src = p2.node GROUP BY 1),
        |p3 AS MATERIALIZED (SELECT nodes.node, 150000 // nn + COALESCE(inflow, 0) AS pr
        |       FROM nodes CROSS JOIN n LEFT JOIN c3 ON c3.node = nodes.node)
        |SELECT CAST(node AS BIGINT) AS node, CAST(pr AS BIGINT) AS pr_ppm
        |FROM p3""".stripMargin
  )
}
