package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Malformed-record quarantine for semi-structured reads: PERMISSIVE
  * parsing with the corrupt line captured in a side column, split into
  * (good, quarantine) — the ingest-time half of data quality (the DQ rule
  * engine judges parsed rows; this catches rows that never parse).
  *
  * The parsed frame is materialized once before the split: Spark refuses a
  * query whose only referenced column is the internal corrupt-record
  * column, and without materialization the two branches would each re-read
  * and re-parse the source. At warehouse scale, write the parsed frame out
  * once and split from that (same discipline, durable form).
  */
object BadRecords {

  /** The quarantine contract, shared by every format: PERMISSIVE read with
    * the corrupt line in a reserved side column, one materialization, one
    * (good, bad) split. `load` supplies the format-specific terminal of
    * the configured reader, so the contract lives in exactly one place. */
  private def split(spark: SparkSession, schema: StructType,
                    options: Map[String, String])
                   (load: org.apache.spark.sql.DataFrameReader => DataFrame)
      : (DataFrame, DataFrame) = {
    val corruptCol = "__corrupt_record"
    require(!schema.fieldNames.contains(corruptCol), s"$corruptCol is reserved")
    val parsed = load(spark.read
        .schema(schema.add(corruptCol, StringType))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corruptCol)
        .options(options))
      .localCheckpoint()
    val good = parsed.filter(col(corruptCol).isNull).drop(corruptCol)
    val bad = parsed.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("corrupt_line"))
    (good, bad)
  }

  /** Split a JSON source into (good rows — `schema`, quarantine — one
    * `corrupt_line` string column). */
  def splitJson(spark: SparkSession, location: String, schema: StructType,
                options: Map[String, String] = Map.empty)
      : (DataFrame, DataFrame) =
    split(spark, schema, options)(_.json(location))

  /** Same split for CSV (PERMISSIVE + corrupt-record column). */
  def splitCsv(spark: SparkSession, location: String, schema: StructType,
               options: Map[String, String] = Map.empty)
      : (DataFrame, DataFrame) =
    split(spark, schema, options)(_.csv(location))
}
