package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.Tables
import graft.functions.ColumnOps
import graft.sources.{DataReader, DataWriter, FileType}

/** Source/sink surface (SURVEY.md §2.1 S1-S3, S6, S10-S12) and the remaining
  * scalar-function operators (F1/F2 timezone-to-GMT, F5 lookup) pushed
  * through the oracle gate.
  *
  * The roundtrip queries write a table out through [[DataWriter]] in the
  * format under test, read it back through [[DataReader]] with an explicit
  * schema (inference is an extra full pass at scale — we only infer where
  * the reference does), and must reproduce the original relation exactly.
  * That exercises writer + reader + schema binding end-to-end, not just a
  * format tag.
  */
object SourceQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Fresh scratch dir per invocation (bench and verify both re-run the
    * roundtrip; timings honestly include the write). */
  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1/S11: CSV sink + scan with explicit schema. Doubles are
    // canonicalized to DECIMAL(18,2) before the text boundary so the
    // rendered form is identical across engines.
    "q12_csv_roundtrip" -> ((s, dir) => {
      val out = scratch("q12")
      val src = t(s, dir, "customer").select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal").cast("decimal(18,2)").as("acctbal"))
      DataWriter.write(src, FileType.Csv, out)
      DataReader.read(s, FileType.Csv, out,
          schema = Some(StructType.fromDDL(
            "c_custkey BIGINT, c_name STRING, c_mktsegment STRING, acctbal DECIMAL(18,2)")))
        .withColumn("acctbal", col("acctbal").cast("double"))
    }),

    // S5/S10: ORC sink + scan — the columnar alternative; binary format,
    // so no text-boundary canonicalization is needed (types survive).
    "q74_orc_roundtrip" -> ((s, dir) => {
      val out = scratch("q74")
      val src = t(s, dir, "supplier")
      DataWriter.write(src, FileType.Orc, out)
      DataReader.read(s, FileType.Orc, out)
    }),

    // S2/S12: JSON sink + scan with explicit schema.
    "q13_json_roundtrip" -> ((s, dir) => {
      val out = scratch("q13")
      val src = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      DataWriter.write(src, FileType.Json, out)
      DataReader.read(s, FileType.Json, out,
        schema = Some(StructType.fromDDL(
          "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")))
    }),

    // S3: XML sink + scan (Spark 4 native XML source; rowTag explicit both
    // ways since native defaults differ from databricks-xml, SURVEY.md §7.4).
    "q14_xml_roundtrip" -> ((s, dir) => {
      val out = scratch("q14")
      val src = t(s, dir, "nation").select(
        col("n_nationkey"), col("n_name"), col("n_regionkey"))
      DataWriter.write(src, FileType.Xml, out, options = Map("rowTag" -> "nation"))
      DataReader.read(s, FileType.Xml, out, options = Map("rowTag" -> "nation"),
        schema = Some(StructType.fromDDL(
          "n_nationkey INT, n_name STRING, n_regionkey INT")))
    }),

    // S6: text sink + line scan (reference names the column `line`,
    // HdfsImport.py:36-37).
    "q15_text_lines" -> ((s, dir) => {
      val out = scratch("q15")
      DataWriter.write(t(s, dir, "customer").select(col("c_name")),
        FileType.Text, out)
      DataReader.read(s, FileType.Text, out)
    }),

    // F1/F2: parse a local-time string and convert to UTC
    // (reference: ETL.py:22-28 hardcodes America/Los_Angeles; the test data
    // spans January only, so there is no DST-ambiguous wall time). Output is
    // epoch seconds — raw timestamps don't cross engines cleanly.
    "q37_tz_gmt" -> ((s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        unix_timestamp(ColumnOps.datetimeToGmt(
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
          "yyyy-MM-dd HH:mm:ss")).as("utc_epoch"))),

    // F5: broadcast-dict lookup over a ;-separated code column — unknown
    // codes pass through, mirroring the reference's dict.get fallback
    // (ETL.py:56-69).
    "q38_lookup_codes" -> ((s, dir) => {
      val mapping = Map("BUILDING" -> "BLD", "AUTOMOBILE" -> "AUTO",
        "MACHINERY" -> "MCH")
      t(s, dir, "customer").select(
        col("c_custkey"),
        ColumnOps.lookup(col("c_mktsegment"), mapping).as("seg_code"),
        ColumnOps.lookup(concat_ws(";", col("c_mktsegment"), lit("NO_SUCH")),
          mapping).as("multi_code"))
    })
  )

  private val segCase =
    """CASE c_mktsegment WHEN 'BUILDING' THEN 'BLD' WHEN 'AUTOMOBILE' THEN 'AUTO'
      | WHEN 'MACHINERY' THEN 'MCH' ELSE c_mktsegment END""".stripMargin

  val oracles: Map[String, String] = Map(
    "q12_csv_roundtrip" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        | CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        |FROM customer""".stripMargin,

    "q13_json_roundtrip" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",

    // binary columnar roundtrip: doubles survive bit-exact, no casts
    "q74_orc_roundtrip" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",

    "q14_xml_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",

    "q15_text_lines" ->
      "SELECT c_name AS line FROM customer",

    "q37_tz_gmt" ->
      """SELECT event_id,
        | epoch(timezone('America/Los_Angeles', date_trunc('second', ts)))::BIGINT AS utc_epoch
        |FROM events""".stripMargin,

    "q38_lookup_codes" ->
      s"""SELECT c_custkey, $segCase AS seg_code,
         | $segCase || ';NO_SUCH' AS multi_code
         |FROM customer""".stripMargin
  )
}
