package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format reader — the engine's source surface.
  *
  * Re-expresses the reference's `read_data_as_spark_dataframe`
  * (reference: src/com/vitthalmirji/utils/spark.py:56-102,
  * imports/HdfsImport.py:26-56) as a sum type over formats instead of a
  * string-dispatched if-chain. XML uses Spark 4's native XML source (the
  * reference needed the external databricks-xml package); option names
  * (`rowTag`, `valueTag`, `attributePrefix`) are compatible but we set them
  * explicitly because native defaults differ (SURVEY.md §7.4).
  */
sealed trait FileType
object FileType {
  case object Csv extends FileType
  case object Json extends FileType
  case object Xml extends FileType
  case object Parquet extends FileType
  case object Orc extends FileType
  case object Text extends FileType
  /** Catalog table by name (reference: utils/spark.py:75-83). */
  case object Table extends FileType
  /** Whole-file binary ingestion (zip members, images, audio…). */
  case object Binary extends FileType

  def fromString(s: String): FileType = s.trim.toLowerCase match {
    case "csv" | "tbl"       => Csv
    case "json"              => Json
    case "xml"               => Xml
    case "parquet"           => Parquet
    case "orc"               => Orc
    case "text" | "txt"      => Text
    case "table" | "hive"    => Table
    case "binary" | "binaryfile" => Binary
    case other => throw new IllegalArgumentException(s"Unsupported filetype '$other'")
  }
}

object DataReader {

  /** CSV defaults matching the reference's header+inferSchema reads
    * (reference: imports/HdfsImport.py:38-39). Explicit `schema` is always
    * preferred at scale — inference is a full extra pass over the data.
    */
  private val csvDefaults = Map("header" -> "true", "inferSchema" -> "true")
  private val xmlDefaults = Map("attributePrefix" -> "_", "valueTag" -> "_VALUE")

  def read(spark: SparkSession,
           fileType: FileType,
           location: String,
           options: Map[String, String] = Map.empty,
           schema: Option[StructType] = None): DataFrame = {
    def withSchema(r: org.apache.spark.sql.DataFrameReader) =
      schema.fold(r)(r.schema)
    fileType match {
      case FileType.Csv =>
        // inferSchema is pointless (and costly) when a schema is supplied
        val opts = if (schema.isDefined) csvDefaults - "inferSchema" ++ options
                   else csvDefaults ++ options
        withSchema(spark.read.options(opts)).csv(location)
      case FileType.Json =>
        withSchema(spark.read.options(options)).json(location)
      case FileType.Xml =>
        withSchema(spark.read.options(xmlDefaults ++ options).format("xml")).load(location)
      case FileType.Parquet =>
        withSchema(spark.read.options(options)).parquet(location)
      case FileType.Orc =>
        withSchema(spark.read.options(options)).orc(location)
      case FileType.Text =>
        require(schema.isEmpty,
          "the text reader emits a fixed single `line` column and does " +
            "not honor a supplied schema; drop the schema argument")
        // single `line` column, as the reference names it (HdfsImport.py:36-37)
        spark.read.options(options).text(location).toDF("line")
      case FileType.Table =>
        require(schema.isEmpty,
          "a catalog table's schema comes from the catalog; a supplied " +
            "schema would be silently ignored — drop the schema argument")
        spark.read.table(location)
      case FileType.Binary =>
        require(schema.isEmpty,
          "the binaryFile source has a fixed schema (path, modificationTime, " +
            "length, content) and does not honor a supplied one")
        spark.read.options(options).format("binaryFile").load(location)
    }
  }
}
