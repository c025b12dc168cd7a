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

    // S8: zip ingestion, gated end-to-end — pack documents into 8 zip
    // archives executor-side (ZipIngest.writeZipMembers), re-ingest them
    // with the streamed extractor, and emit per-member identity facts
    // (byte length + md5 of the decoded content). The oracle computes the
    // same facts straight off the table, so any corruption, loss, or
    // duplication across the zip boundary flips the row hash.
    "q132_zip_roundtrip" -> ((s, dir) => {
      val out = scratch("q132")
      val docs = t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      graft.sources.ZipIngest.writeZipMembers(docs, out,
        archiveCol = pmod(col("doc_id"), lit(8)),
        memberCol = concat(lit("doc_"), col("doc_id"), lit(".txt")),
        contentCol = col("text"))
      graft.sources.ZipIngest.readZipMembers(s, out).toDF()
        .select(
          regexp_extract(col("member"), "doc_(\\d+)\\.txt", 1)
            .cast("bigint").as("doc_id"),
          col("member"),
          length(col("content")).cast("bigint").as("size_bytes"),
          md5(col("content")).as("content_md5"))
    }),

    // F10: recipe-difficulty bucketing (reference recipe_tasks.py:206-239)
    // gated on its threshold arithmetic: total times in half-minute steps
    // hit both bucket edges exactly (29.5 easy, 30.0 medium, 60.0 medium,
    // 60.5 hard) and the click rows exercise the null→unknown branch.
    "q133_difficulty_buckets" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("total_us",
          when(col("event_type") === "click", lit(null).cast("long"))
            .otherwise((col("event_id") % 181) * 30L * 1000000L))
        .withColumn("difficulty",
          graft.functions.IsoDuration.difficulty(col("total_us")))
        .groupBy("difficulty").agg(count(lit(1)).as("n"))),

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
         |FROM customer""".stripMargin,

    // strlen = UTF-8 byte length (DuckDB length() counts characters)
    "q132_zip_roundtrip" ->
      """SELECT doc_id, 'doc_' || doc_id || '.txt' AS member,
        | CAST(strlen(text) AS BIGINT) AS size_bytes,
        | md5(text) AS content_md5
        |FROM documents WHERE text IS NOT NULL""".stripMargin,

    "q133_difficulty_buckets" ->
      """WITH q AS (
        |  SELECT CASE WHEN event_type = 'click' THEN NULL
        |              ELSE (event_id % 181) * 30 * 1000000 END AS total_us
        |  FROM events)
        |SELECT CASE WHEN total_us IS NULL THEN 'unknown'
        |            WHEN total_us / 60000000.0 < 30 THEN 'easy'
        |            WHEN total_us / 60000000.0 <= 60 THEN 'medium'
        |            ELSE 'hard' END AS difficulty,
        |       COUNT(*) AS n
        |FROM q GROUP BY 1""".stripMargin
  )
}
