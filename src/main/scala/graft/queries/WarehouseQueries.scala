package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.warehouse.Cdc

/** CDC + data-quality queries with DuckDB oracles. Old/new CDC snapshots are
  * derived deterministically from `orders` (no extra fixtures needed):
  * old = keys not divisible by 3; new = all keys, price bumped where key%7=0.
  * Prices are canonicalized to DECIMAL(18,2) before hashing so the md5 input
  * strings render identically in Spark and DuckDB.
  */
object WarehouseQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val hashCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "p")

  private def base(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice").cast("decimal(18,2)").as("p"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.12 CDC composite: left_anti inserts + hash-mismatch updates.
    "q30_cdc_changes" -> ((s, dir) => {
      val b = base(s, dir)
      val oldDf = Cdc.addContentHash(
        b.filter(col("o_orderkey") % 3 =!= 0), hashCols)
      val newDf = Cdc.addContentHash(
        b.withColumn("p",
          when(col("o_orderkey") % 7 === 0, col("p") + 10).otherwise(col("p"))
            .cast("decimal(18,2)")), hashCols)
      Cdc.classifyChanges(oldDf, newDf, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("p").cast("double").as("o_totalprice"), col("change_type"))
    }),

    // Full-outer merge classification (I/U/D/N counts).
    "q31_cdc_merge_stats" -> ((s, dir) => {
      val b = base(s, dir)
      val oldDf = Cdc.addContentHash(b.filter(col("o_orderkey") % 3 =!= 0), hashCols)
      val newDf = Cdc.addContentHash(
        b.filter(col("o_orderkey") % 5 =!= 0)
          .withColumn("p",
            when(col("o_orderkey") % 7 === 0, col("p") + 10).otherwise(col("p"))
              .cast("decimal(18,2)")), hashCols)
      Cdc.mergeClassify(oldDf, newDf, Seq("o_orderkey"))
        .groupBy(col("change_type")).agg(count(lit(1)).as("n"))
    }),

    // §2.11 DQ rules as one declarative result set: unique + not-null
    // violation counts with pass flags, fused where possible.
    "q32_dq_rules" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val lineitem = t(s, dir, "lineitem")
      def row(id: String, rtype: String, violations: DataFrame): DataFrame =
        violations.select(lit(id).as("rule_id"), lit(rtype).as("rule_type"),
          col("violations"), (col("violations") === 0).as("passed"))
      val r1 = row("unique_orderkey", "unique",
        orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") > 1).agg(count(lit(1)).as("violations")))
      val r2 = row("unique_custkey", "unique",
        orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") > 1).agg(count(lit(1)).as("violations")))
      val r3 = row("notnull_status", "not null",
        orders.agg(sum(when(col("o_orderstatus").isNull ||
          trim(col("o_orderstatus")) === "", 1L).otherwise(0L)).as("violations")))
      val r4 = row("unique_lineitem_pk", "unique",
        lineitem.groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") > 1).agg(count(lit(1)).as("violations")))
      r1.unionByName(r2).unionByName(r3).unionByName(r4)
    })
  )

  /** Null-canonicalized hash input, mirroring [[graft.functions.ColumnOps.contentHash]]. */
  private val hashExpr =
    "md5(concat_ws('~', COALESCE(CAST(o_orderkey AS VARCHAR), chr(0)), COALESCE(CAST(o_custkey AS VARCHAR), chr(0)), COALESCE(o_orderstatus, chr(0)), COALESCE(CAST(p AS VARCHAR), chr(0))))"

  private val oldCte =
    s"""base AS (SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
      |old AS (SELECT *, $hashExpr AS hashcode
      |  FROM base WHERE o_orderkey % 3 <> 0)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q30_cdc_changes" ->
      s"""WITH $oldCte,
         |neww AS (SELECT o_orderkey, o_custkey, o_orderstatus,
         |  CAST(CASE WHEN o_orderkey % 7 = 0 THEN p + 10 ELSE p END AS DECIMAL(18,2)) AS p FROM base),
         |newh AS (SELECT *, $hashExpr AS hashcode FROM neww)
         |SELECT n.o_orderkey, n.o_custkey, n.o_orderstatus,
         |  CAST(n.p AS DOUBLE) AS o_totalprice, 'I' AS change_type
         |FROM newh n WHERE NOT EXISTS (SELECT 1 FROM old o WHERE o.o_orderkey = n.o_orderkey)
         |UNION ALL
         |SELECT n.o_orderkey, n.o_custkey, n.o_orderstatus,
         |  CAST(n.p AS DOUBLE) AS o_totalprice, 'U' AS change_type
         |FROM newh n JOIN old o ON o.o_orderkey = n.o_orderkey AND o.hashcode <> n.hashcode""".stripMargin,

    "q31_cdc_merge_stats" ->
      s"""WITH $oldCte,
         |neww AS (SELECT o_orderkey, o_custkey, o_orderstatus,
         |  CAST(CASE WHEN o_orderkey % 7 = 0 THEN p + 10 ELSE p END AS DECIMAL(18,2)) AS p
         |  FROM base WHERE o_orderkey % 5 <> 0),
         |newh AS (SELECT *, $hashExpr AS hashcode FROM neww)
         |SELECT change_type, COUNT(*) AS n FROM (
         | SELECT CASE WHEN o.o_orderkey IS NULL THEN 'I'
         |             WHEN n.o_orderkey IS NULL THEN 'D'
         |             WHEN n.hashcode <> o.hashcode THEN 'U'
         |             ELSE 'N' END AS change_type
         | FROM newh n FULL OUTER JOIN old o ON n.o_orderkey = o.o_orderkey)
         |GROUP BY change_type""".stripMargin,

    // Every `violations` branch is CAST to BIGINT: DuckDB's SUM returns
    // HUGEINT and the UNION ALL would widen all branches to HUGEINT,
    // hash-mismatching Spark's long even when values are identical.
    "q32_dq_rules" ->
      """SELECT 'unique_orderkey' AS rule_id, 'unique' AS rule_type,
        | CAST((SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)) AS BIGINT) AS violations,
        | (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)) = 0 AS passed
        |UNION ALL
        |SELECT 'unique_custkey', 'unique',
        | CAST((SELECT COUNT(*) FROM (SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1)) AS BIGINT),
        | (SELECT COUNT(*) FROM (SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1)) = 0
        |UNION ALL
        |SELECT 'notnull_status', 'not null',
        | CAST((SELECT COALESCE(SUM(CASE WHEN o_orderstatus IS NULL OR TRIM(o_orderstatus) = '' THEN 1 ELSE 0 END), 0) FROM orders) AS BIGINT),
        | (SELECT COALESCE(SUM(CASE WHEN o_orderstatus IS NULL OR TRIM(o_orderstatus) = '' THEN 1 ELSE 0 END), 0) FROM orders) = 0
        |UNION ALL
        |SELECT 'unique_lineitem_pk', 'unique',
        | CAST((SELECT COUNT(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) > 1)) AS BIGINT),
        | (SELECT COUNT(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) > 1)) = 0""".stripMargin
  )
}
