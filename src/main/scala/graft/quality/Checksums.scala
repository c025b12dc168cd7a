package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps

/** Order-independent table checksums for cross-system reconciliation —
  * "did the migration/replication/backfill produce the same rows?" answered
  * with one aggregate per side instead of a full-table diff join. The
  * checksum is the SUM of a per-row 48-bit md5-derived hash: commutative
  * and associative, so it is partitioning-, ordering-, and engine-
  * independent (md5 is standardized; the sum is exact integer arithmetic in
  * DECIMAL(38,0)/HUGEINT) — any single changed, missing, or duplicated row
  * changes the group checksum with probability 1 − 2⁻⁴⁸ per group.
  *
  * Scale shape: one map-side-combine hash-agg over the table; the grouped
  * form checksums partitions independently so a mismatch localizes to a
  * group without rescanning everything (the standard divide-and-conquer
  * reconciliation sweep).
  */
object Checksums {

  /** Per-row 48-bit hash over `cols` (null-canonicalized, '~'-joined md5 —
    * the [[ColumnOps.contentHash]] bytes, truncated to 48 bits so the
    * per-row value fits comfortably in a BIGINT). Computed by the
    * allocation-free [[graft.functions.Md5Prefix]] codegen kernel;
    * bit-for-bit `conv(substring(contentHash, 1, 12), 16, 10)` — the
    * portable formulation the DuckDB oracle keeps. */
  def rowHash48(cols: Seq[Column]): Column =
    graft.functions.Md5Prefix.prefix48(ColumnOps.canonicalJoined(cols))

  /** (groupCols..., n_rows, checksum): the group's row count plus the
    * order-independent content checksum, emitted as a decimal STRING (the
    * sum exceeds BIGINT range on large groups; DECIMAL(38,0) and DuckDB's
    * HUGEINT print identical digits). */
  def grouped(df: DataFrame, groupCols: Seq[String],
              cols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(rowHash48(cols.map(col)).cast("decimal(38,0)"))
          .cast("decimal(38,0)").cast("string").as("checksum"))

  /** Whole-table checksum: single row (n_rows, checksum). */
  def table(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
      sum(rowHash48(cols.map(col)).cast("decimal(38,0)"))
        .cast("decimal(38,0)").cast("string").as("checksum"))
}
