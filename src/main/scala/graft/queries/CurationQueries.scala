package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Stats
import graft.core.Tables
import graft.quality.Privacy
import graft.sampling.Sampling

/** Dataset-governance pack: the checks and rebalancing steps that run just
  * before a corpus release — k-anonymity audit of quasi-identifiers,
  * deterministic source-mix rebalancing, and a Benford first-digit screen
  * for fabricated numeric columns. All-integer outputs, hash-gated.
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // k-anonymity over (segment, nation): equivalence-class sizes,
    // violations of k=10, and re-identification risk in ppm.
    "q114_kanonymity" -> ((s, dir) =>
      Privacy.kAnonymity(t(s, dir, "customer"),
        Seq("c_mktsegment", "c_nationkey"), k = 10L)),

    // Source-mix rebalancing: down-sample over-represented document
    // sources to the equal share via subset-monotone key-hash membership —
    // the deterministic twin of sampleBy, reproducible across engines,
    // partitionings, and reruns.
    "q115_source_mix" -> ((s, dir) =>
      Sampling.balanceSources(t(s, dir, "documents"),
        col("source"), col("doc_id"))
        .select(col("doc_id"), col("source"), col("rate_ppm"))),

    // Benford first-digit profile of order totals (in cents): observed vs
    // expected shares in integer ppm; digits come from the integer's
    // decimal string, never float log10.
    "q116_benford" -> ((s, dir) =>
      Stats.benford(t(s, dir, "orders"),
        floor(col("o_totalprice") * lit(100) + lit(0.5))))
  )

  val oracles: Map[String, String] = Map(

    "q114_kanonymity" ->
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
        |  COUNT(*) < 10 AS violates,
        |  CAST(1000000 // COUNT(*) AS BIGINT) AS risk_ppm
        |FROM customer GROUP BY 1, 2""".stripMargin,

    "q115_source_mix" ->
      """WITH c AS (SELECT COALESCE(source, chr(0) || 'null') AS src,
        |             COUNT(*) AS n_s FROM documents GROUP BY 1),
        |t AS (SELECT COUNT(*) AS n_tot,
        |             COUNT(DISTINCT COALESCE(source, chr(0) || 'null')) AS n_src
        |      FROM documents),
        |r AS (SELECT src,
        |        LEAST(1000000, (n_tot * 1000000) // (n_src * n_s)) AS rate_ppm
        |      FROM c CROSS JOIN t)
        |SELECT d.doc_id, d.source, CAST(r.rate_ppm AS BIGINT) AS rate_ppm
        |FROM documents d
        |JOIN r ON COALESCE(d.source, chr(0) || 'null') = r.src
        |WHERE (('0x' || substr(md5(COALESCE(CAST(doc_id AS VARCHAR), chr(0) || 'null')), 1, 15))::BIGINT
        |       % 2147483647) % 1000000 < rate_ppm""".stripMargin,

    "q116_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100.0 + 0.5)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders WHERE FLOOR(o_totalprice * 100.0 + 0.5) > 0),
        |g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1)
        |SELECT digit, n,
        |  CAST((n * 1000000) // SUM(n) OVER () AS BIGINT) AS observed_ppm,
        |  CAST(CASE digit
        |    WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
        |    WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
        |    WHEN 7 THEN 57992 WHEN 8 THEN 51153 WHEN 9 THEN 45757
        |  END AS BIGINT) AS expected_ppm
        |FROM g""".stripMargin
  )
}
