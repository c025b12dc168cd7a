package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the "what is in this table" first contact every
  * pipeline needs before DQ rules can be written (the reference's
  * describe/show-based inspection, made a first-class operator).
  *
  * ONE scan, ONE aggregation: all per-column statistics are computed in a
  * single `agg(...)` (Spark plans the multi-distinct via Expand — still one
  * pass over the data, one shuffle), then unpivoted with `stack` into one
  * row per column. No per-column scans, no driver-side loop over columns.
  *
  * min/max are canonicalized to strings through DECIMAL(28,6) for numeric
  * columns (fixed-scale rendering — engine-independent, unlike raw double
  * formatting) and plain casts otherwise, so profiles hash-compare across
  * engines. At 100 TB swap `count_distinct` for `approx_count_distinct`
  * (HLL, mergeable, no Expand multiplication) — the profile shape is
  * unchanged.
  */
object Profiler {

  /** Fixed-scale decimal rendering where the value fits, plain cast where
    * it doesn't: a bare decimal(28,6) cast overflows for |v| >= 1e22 —
    * under ANSI (Spark 4 default) that THREW and killed the whole profile,
    * with ansi=false it silently nulled min/max of a fully-populated
    * column. try_cast + coalesce keeps the profiler total on first-contact
    * data, which is its entire job. */
  private def canon(c: Column, dt: DataType): Column = dt match {
    case _: NumericType =>
      coalesce(c.try_cast("decimal(28,6)").cast("string"), c.cast("string"))
    case _ => c.cast("string")
  }

  /** One row per profiled column:
    * (col_name, n_rows, n_nonnull, n_distinct, min_val, max_val).
    *
    * Internal aliases are POSITIONAL (`nn__0`, not `nn__<name>`): a legal
    * column name that is not a bare SQL identifier (`order-date`, a space,
    * a quote) would otherwise be spliced into `selectExpr` unquoted and
    * throw — the name now appears only as an escaped string literal. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // Unorderable types (any MapType, incl. nested): count_distinct and
    // min/max reject them with an AnalysisException, which killed the
    // WHOLE single-agg profile — the profiler's entire job is staying
    // total on first-contact data. Such columns profile as
    // (n_nonnull, NULL, NULL, NULL) instead of aborting every column.
    def hasMap(dt: DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: cols.zipWithIndex.flatMap {
      case (name, i) =>
        val c = col(name)
        val dt = df.schema(name).dataType
        if (hasMap(dt))
          Seq(count(c).as(s"nn__$i"),
            first(lit(null).cast("long")).as(s"nd__$i"),
            first(lit(null).cast("string")).as(s"mn__$i"),
            first(lit(null).cast("string")).as(s"mx__$i"))
        else
          Seq(count(c).as(s"nn__$i"),
            count_distinct(c).as(s"nd__$i"),
            canon(min(c), dt).as(s"mn__$i"),
            canon(max(c), dt).as(s"mx__$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // The stack emits the column INDEX (an int literal — nothing to
    // escape), and the real name maps back through an array-of-literals
    // lookup. Splicing the name as a SQL string literal needed
    // mode-dependent escaping (backslashes go through escape processing
    // under the default parser but not under escapedStringLiterals) — a
    // name like `a\nb` silently corrupted col_name.
    val stackArgs = cols.indices.map(i =>
      s"$i, nn__$i, nd__$i, mn__$i, mx__$i").mkString(", ")
    one.selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS (col_idx, n_nonnull, n_distinct, min_val, max_val)")
      .select(
        element_at(array(cols.map(lit): _*), col("col_idx") + 1).as("col_name"),
        col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}
