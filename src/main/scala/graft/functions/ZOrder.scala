package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data clustering —
  * the layout trick behind data skipping on two filter columns at once:
  * sorting by the interleaved key keeps rows close in BOTH dimensions
  * close in the file order, so per-file min/max statistics prune scans for
  * either predicate (what Delta/Iceberg expose as OPTIMIZE ZORDER BY).
  *
  * The interleave is pure integer column arithmetic — 2·bits shift/mask
  * terms OR-folded, fully codegen'd, restatable verbatim in any SQL
  * engine (no UDF, no custom expression needed).
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integral
    * columns: bit i of x lands at position 2i, bit i of y at 2i+1.
    *
    * Inputs are widened to LONG before shifting: on an IntegerType column
    * Spark's shiftleft uses 32-bit semantics (shift count mod 32, sign
    * bit at position 31), so with bits ≥ 16 an un-widened interleave put
    * y's bit 15 in the sign bit and WRAPPED higher positions — distinct
    * (x, y) pairs silently collided onto one key and negative keys sorted
    * before all others. Legal `bits` up to 31 means positions up to 62:
    * long semantics throughout, in both the Column and the SQL twin. */
  def interleave2(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as engine-portable SQL text (for oracles and
    * generated DDL): OR of shift/mask terms over column names. The same
    * widening rule as [[interleave2]] — CAST AS BIGINT before shifting. */
  def interleave2Sql(x: String, y: String, bits: Int): String = {
    val (xl, yl) = (s"CAST($x AS BIGINT)", s"CAST($y AS BIGINT)")
    (0 until bits).map { i =>
      s"((($xl >> $i) & 1) << ${2 * i}) | ((($yl >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
  }

  /** Cluster `df` for a z-ordered write: range-partition then sort within
    * partitions by the Morton key of the two (bucketized) columns. Range ×
    * local sort keeps files tight in z-space WITHOUT a global sort's single
    * final-stage bottleneck; downstream writers get one tight z-range per
    * task → per-file min/max on BOTH source columns stay narrow. */
  def clusterByZ(df: DataFrame, x: Column, y: Column, bits: Int,
                 numPartitions: Int): DataFrame = {
    // A pre-existing __z would be overwritten by the Morton key and then
    // REMOVED by the trailing drop — the output would silently lose one
    // of the input's columns.
    require(!df.columns.contains("__z"),
      "__z is reserved by clusterByZ; rename the input column")
    val z = interleave2(x, y, bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
