package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.meta.Model._
import graft.meta.Planner

/** The metadata-driven ETL planner exercised end-to-end through the oracle
  * gate: a Catalog declared over the TPC-H tables compiles to filter →
  * cast/udf projection → BFS FK joins → group/agg + HAVING, and must
  * hash-match the equivalent handwritten SQL.
  */
object MetaQueries {

  /** lineitem →(INNER)→ orders →(LEFT)→ customer. */
  private val model: Map[String, TableNode] = Map(
    "lineitem" -> TableNode("lineitem", Seq("l_orderkey", "l_linenumber"),
      Map("orders" -> FkEdge(Seq("l_orderkey"), Seq("o_orderkey"), "inner"))),
    "orders" -> TableNode("orders", Seq("o_orderkey"),
      Map("customer" -> FkEdge(Seq("o_custkey"), Seq("c_custkey"), "left"))),
    "customer" -> TableNode("customer", Seq("c_custkey"), Map.empty))

  private def m(srcTable: String, srcCol: String, targetCol: String,
                dtype: String = "string", order: Int = 1,
                filter: Option[String] = None, agg: Option[String] = None,
                having: Option[String] = None, udf: Option[String] = None,
                udfArgs: Seq[String] = Nil): MetaResult =
    MetaResult(srcTable, "parquet", "", srcCol, dtype, None, filter, agg,
      having, udf, udfArgs, order, "sales_summary", targetCol, dtype)

  private val meta = Seq(
    m("lineitem", "l_returnflag", "return_flag", filter = Some("eq('R')")),
    m("lineitem", "l_quantity", "total_qty", dtype = "decimal(18,2)",
      agg = Some("sum"), having = Some("gt(100)")),
    m("orders", "o_orderstatus", "order_status", order = 2),
    m("customer", "c_mktsegment", "segment", order = 3,
      udf = Some("nvl"), udfArgs = Seq("-")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_meta_etl" -> ((s, dir) => {
      val sources = Map(
        "lineitem" -> Tables.load(s, dir, "lineitem"),
        "orders" -> Tables.load(s, dir, "orders"),
        "customer" -> Tables.load(s, dir, "customer"))
      Planner.transform(sources, Catalog(meta, model), "sales_summary")
        .withColumn("total_qty", col("total_qty").cast("double"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q33_meta_etl" ->
      """SELECT l_returnflag AS return_flag, o_orderstatus AS order_status,
        | COALESCE(c_mktsegment, '-') AS segment,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |LEFT JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) > 100""".stripMargin
  )
}
