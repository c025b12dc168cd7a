package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextOps

/** Weighted-order-statistic + custom-operator-reuse pack: an exact
  * weighted median via the cumulative-weight crossing rule, and per-language
  * vocabulary top-k routed through the custom TopKPerKey physical operator
  * (its second gated deployment, on a text shape).
  */
object WeightedQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact weighted median of line quantity (weights = extended price),
    // all integer: sort by value within the group, accumulate weights, the
    // median is the first value whose running weight reaches half the
    // total (2·cum ≥ tot avoids any division). One exchange + one
    // partition-local sort; both windows share the partitioning.
    "q122_weighted_median" -> ((s, dir) => {
      val q = t(s, dir, "lineitem").select(col("l_returnflag"),
        floor(col("l_quantity") * lit(100) + lit(0.5)).cast("long").as("qc"),
        floor(col("l_extendedprice") * lit(100) + lit(0.5)).cast("long").as("wc"),
        col("l_orderkey"), col("l_linenumber"))
      val wRun = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("qc"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy(col("l_returnflag"))
      q.withColumn("cum", sum(col("wc")).over(wRun))
        .withColumn("tot", sum(col("wc")).over(wAll))
        .where(col("cum") * 2 >= col("tot"))
        .groupBy(col("l_returnflag"))
        .agg(min(col("qc")).as("wmedian_qc"), min(col("tot")).as("total_wc"))
    }),

    // Vocabulary top-5 per language through TopKPerKeyNode → partial/final
    // bounded-heap exec: ≤ 5 rows per (lang, partition) cross the
    // exchange, vs the window formulation shuffling every distinct term.
    "q123_vocab_topk" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .select(col("lang"), explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy(col("lang"), col("term"))
        .agg(count(lit(1)).as("n"))
      graft.plans.TopK.perKey(counts, keys = Seq("lang"),
          orderBy = Seq(("n", false), ("term", true)), k = 5)
        .select(col("lang"), col("term"), col("n"))
    })
  )

  val oracles: Map[String, String] = Map(

    "q122_weighted_median" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |    CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT) AS qc,
        |    CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS wc,
        |    l_orderkey, l_linenumber
        |  FROM lineitem),
        |c AS (
        |  SELECT l_returnflag, qc, wc,
        |    SUM(wc) OVER (PARTITION BY l_returnflag
        |      ORDER BY qc, l_orderkey, l_linenumber
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(wc) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM q)
        |SELECT l_returnflag, CAST(MIN(qc) AS BIGINT) AS wmedian_qc,
        |  CAST(MIN(tot) AS BIGINT) AS total_wc
        |FROM c WHERE cum * 2 >= tot GROUP BY 1""".stripMargin,

    "q123_vocab_topk" ->
      """WITH c AS (
        |  SELECT lang, term, COUNT(*) AS n FROM (
        |    SELECT lang,
        |      unnest(list_filter(string_split_regex(text, '\s+'), t -> t <> ''))
        |        AS term
        |    FROM documents)
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, term, n, row_number() OVER (
        |    PARTITION BY lang ORDER BY n DESC, term ASC) AS rk
        |  FROM c)
        |SELECT lang, term, n FROM r WHERE rk <= 5""".stripMargin
  )
}
