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
    // all integer: the median is the first value whose running weight
    // reaches half the total (2·cum ≥ tot avoids any division).
    //
    // Computed over the (group, value) weight HISTOGRAM, not a sorted
    // fact table: the crossing value is identical — for any qc below the
    // first crossing row's, the histogram's running weight is a row-level
    // cum (< tot/2), and at the crossing row's qc it is ≥ that row's cum —
    // so min(crossing qc) agrees with the row-ordered rule. The row-level
    // formulation sorts the whole fact table into |groups| window
    // partitions (3 reducers own 6M rows at 10×); the histogram is one
    // map-side-combined hash-agg at full parallelism, and the window runs
    // over |groups|·|distinct cents| ≈ 150 rows. The same shape is the
    // scale answer for any discretized domain — and money values ARE
    // discrete in cents.
    "q122_weighted_median" -> ((s, dir) => {
      val hist = t(s, dir, "lineitem").select(col("l_returnflag"),
          floor(col("l_quantity") * lit(100) + lit(0.5)).cast("long").as("qc"),
          floor(col("l_extendedprice") * lit(100) + lit(0.5)).cast("long").as("wc"))
        .groupBy(col("l_returnflag"), col("qc"))
        // long sum headroom: price cents ≤ 10⁷/row leaves ~180× margin per
        // (flag, qc) bucket at the 10¹¹-row scale target (vs the money
        // pass's 10⁹-unit products, which needed the decimal combine).
        .agg(sum(col("wc")).as("w"))
      val wRun = Window.partitionBy(col("l_returnflag")).orderBy(col("qc"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy(col("l_returnflag"))
      hist.withColumn("cum", sum(col("w")).over(wRun))
        .withColumn("tot", sum(col("w")).over(wAll))
        .where(col("cum") * 2 >= col("tot"))
        .groupBy(col("l_returnflag"))
        .agg(min(col("qc")).as("wmedian_qc"), min(col("tot")).as("total_wc"))
    }),

    // Gini coefficient of customer spend per market segment — inequality
    // of the spend distribution via the sorted-rank identity
    // G = (2·Σ(i·yᵢ) − (n+1)·Σy) / (n·Σy) over a TOTAL order (spend,
    // custkey). Both moment sums are exact decimals; doubles appear once
    // in the final ratio, floor-quantized to ppm.
    "q131_gini_spend" -> ((s, dir) => {
      val spend = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_custkey"),
          (col("sp") * 100).cast("decimal(38,0)").as("yc"))
      // Per-segment rank via Ranked.rowNumberRanged: a window partitioned
      // by the 5 market segments put ~1/5 of ALL customers on each of 5
      // tasks; the ranged decomposition keeps the same exact i at
      // segments×ranges parallelism.
      graft.operators.Ranked.rowNumberRanged(spend, Seq("c_mktsegment"),
          Seq(col("yc"), col("o_custkey")), "i")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("yc")).as("sy"),
          sum(col("yc") * col("i")).as("siy"))
        .select(col("c_mktsegment"), col("n"),
          floor((
            (lit(2) * col("siy") - (col("n") + lit(1)) * col("sy"))
              .cast("double") /
            (col("n") * col("sy")).cast("double")) * lit(1e6) + lit(0.5))
            .cast("long").as("gini_ppm"))
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

    "q131_gini_spend" ->
      """WITH sp AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
        |  FROM orders GROUP BY 1),
        |y AS (
        |  SELECT c.c_mktsegment, sp.o_custkey,
        |    CAST(sp.s * 100 AS HUGEINT) AS yc
        |  FROM sp JOIN customer c ON sp.o_custkey = c.c_custkey),
        |r AS (
        |  SELECT c_mktsegment, yc,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY yc, o_custkey) AS BIGINT) AS i
        |  FROM y),
        |m AS (
        |  SELECT c_mktsegment, COUNT(*) AS n,
        |    CAST(SUM(yc) AS HUGEINT) AS sy,
        |    CAST(SUM(yc * i) AS HUGEINT) AS siy
        |  FROM r GROUP BY 1)
        |SELECT c_mktsegment, n,
        |  CAST(FLOOR(
        |    (CAST(2 * siy - (n + 1) * sy AS DOUBLE)
        |     / CAST(n * sy AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |    AS gini_ppm
        |FROM m""".stripMargin,

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
