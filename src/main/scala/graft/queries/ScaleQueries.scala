package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.SkewJoin
import graft.sources.Bucketing

/** Scale-mechanics pack: the two join strategies a 100 TB deployment leans
  * on — explicit salting for hot keys and bucketed co-located joins — each
  * proven RESULT-IDENTICAL to the plain join by the oracle gate (the whole
  * point of both techniques is changing the execution shape without
  * changing one output row).
  */
object ScaleQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Salted replicate join (hot keys split across 8 salt buckets, dim
    // replicated 8×) rolled up per segment/type — the gate proves salting
    // changed nothing but the partitioning.
    "q120_salted_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("value"))
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      SkewJoin.saltedJoin(ev, dim, Seq("user_id"), buckets = 8)
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
    }),

    // Bucketed write → exchange-free co-located join: both fact tables
    // land bucketed+sorted on the join key (one shuffle at write time),
    // then join with NO exchange on either side (spec-pinned) — the
    // pay-once amortization for recurring fact-to-fact joins. The gate
    // proves the bucketed path returns exactly the plain join's rows.
    "q121_bucketed_join" -> ((s, dir) => {
      // Table names are STABLE per (session, sf dir) and the write is
      // skipped when they already exist — that IS the operator's
      // amortization (pay the bucketing shuffle once, every later join is
      // exchange-free), and it keeps repeated bench reps / plan audits
      // from re-writing and leaking tables per invocation.
      // Collision-proof tag: the readable sanitized dir PLUS an md5
      // prefix of the RAW dir string — sanitization alone is lossy
      // (/data/sf0.1 and /data/sf0_1 collapse to one tag), and a
      // collision would silently reuse the FIRST dir's bucketed tables
      // for the second.
      val md5tag = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + md5tag
      val (lt, ot) = (s"graft_q121_l_$tag", s"graft_q121_o_$tag")
      if (!s.catalog.tableExists(lt) || !s.catalog.tableExists(ot)) {
        val base = Files.createTempDirectory("graft_q121").toString
        Bucketing.writeBucketed(
          t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity")),
          lt, s"$base/l", Seq("l_orderkey"), numBuckets = 8)
        Bucketing.writeBucketed(
          t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
            col("o_orderpriority")),
          ot, s"$base/o", Seq("l_orderkey"), numBuckets = 8)
      }
      Bucketing.coLocatedJoin(s, lt, ot, Seq("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
    })
  )

  val oracles: Map[String, String] = Map(

    "q120_salted_join" ->
      """SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2""".stripMargin,

    "q121_bucketed_join" ->
      """SELECT o.o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin
  )
}
