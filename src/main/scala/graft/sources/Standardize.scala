package graft.sources

import org.apache.spark.sql.DataFrame

/** Column-name hygiene: trim / lowercase / snake_case / rename / ordered
  * projection (reference: utils/spark.py:150-177, MetaModel.py:547-568).
  * Pure metadata operations — zero data movement.
  */
object Standardize {

  /** trim + lowercase + spaces→underscore for every column name. */
  def standardizeColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(c => c.trim.toLowerCase.replaceAll("\\s+", "_")): _*)

  /** camelCase / PascalCase → snake_case. */
  def snakeCase(name: String): String =
    name.trim
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
      .replaceAll("[\\s-]+", "_")
      .toLowerCase

  def snakeCaseColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(snakeCase): _*)

  /** Apply an explicit rename map; names absent from the map pass through. */
  def renameColumns(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** Alphabetically ordered projection (reference: MetaModel.py:559-568). */
  def sortColumns(df: DataFrame, ascending: Boolean = true): DataFrame = {
    val sorted = if (ascending) df.columns.sorted else df.columns.sorted.reverse
    df.select(sorted.map(df.col): _*)
  }
}
