package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema/column assertions and driver-side column extracts
  * (SURVEY.md §2.2 P7-P9; reference: MetaModel.py:471-544).
  *
  * The validators raise typed exceptions at plan-construction time — the
  * earliest point an invalid pipeline can fail, before any cluster work.
  * The extracts are intentionally driver-side (`collect`): they exist for
  * small dimension/metadata relations; anything large should stay
  * distributed.
  */
object Checks {

  final class MissingColumnsException(val missing: Seq[String], df: DataFrame)
    extends IllegalArgumentException(
      s"missing columns ${missing.mkString(", ")} (have: ${df.columns.mkString(", ")})")

  final class UnexpectedColumnsException(val present: Seq[String])
    extends IllegalArgumentException(s"columns must be absent: ${present.mkString(", ")}")

  final class SchemaMismatchException(val missing: Seq[String])
    extends IllegalArgumentException(s"schema missing required fields: ${missing.mkString(", ")}")

  final class ColumnMismatchException(msg: String) extends AssertionError(msg)

  /** P7: every listed column present (reference: validatePresenceOfColumns). */
  def requireColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    val have = df.columns.toSet
    val missing = cols.filterNot(have)
    if (missing.nonEmpty) throw new MissingColumnsException(missing, df)
    df
  }

  /** P7: none of the listed columns present (validateAbsenseOfColumns). */
  def requireColumnsAbsent(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = cols.filter(df.columns.toSet)
    if (present.nonEmpty) throw new UnexpectedColumnsException(present)
    df
  }

  /** P7: `required` is a (name, dataType) subset of the schema
    * (reference: validateSchema StructField-subset check). */
  def requireSchemaSubset(df: DataFrame, required: StructType): DataFrame = {
    val have = df.schema.map(f => f.name -> f.dataType).toMap
    val missing = required.filterNot(f => have.get(f.name).contains(f.dataType))
    if (missing.nonEmpty)
      throw new SchemaMismatchException(missing.map(f => s"${f.name}:${f.dataType.simpleString}"))
    df
  }

  /** P8: single column to a driver list (reference: columnToList). */
  def columnToList[T](df: DataFrame, col0: String): Seq[T] =
    df.select(col(col0)).collect().toSeq.map(_.getAs[T](0))

  /** P8: two columns to a driver map (reference: twoColumns2Dictionary).
    * On duplicate keys the row that is later IN COLLECT ORDER wins — that
    * is partition order, not source order, so it is only deterministic
    * when the upstream plan's row order is (a single-split scan, or an
    * explicit orderBy). Callers that need a defined winner must
    * deduplicate or order first; this mirrors the reference, whose
    * dict-assignment loop had the same partition-order dependence. */
  def twoColumnsToMap[K, V](df: DataFrame, key: String, value: String): Map[K, V] =
    df.select(col(key), col(value)).collect()
      .map(r => r.getAs[K](0) -> r.getAs[V](1)).toMap

  /** P8: rows as column-name maps (reference: toListOfDictionaries). */
  def toListOfMaps(df: DataFrame): Seq[Map[String, Any]] = {
    val names = df.columns
    df.collect().toSeq.map((r: Row) => names.zip(r.toSeq).toMap)
  }

  /** P9: assert two columns are pairwise equal — distributed, not the
    * reference's collect-and-compare (MetaModel.py:531-544): count the
    * mismatching rows (null-safe) and fail with the count. */
  def assertColumnsEqual(df: DataFrame, a: String, b: String): Unit = {
    val bad = df.filter(!(col(a) <=> col(b))).count()
    if (bad > 0)
      throw new ColumnMismatchException(s"$bad rows where $a <> $b")
  }
}
