package graft.quality

import graft.SparkSpec

/** The reconciliation property: identical content ⇒ identical checksum
  * regardless of row order/partitioning; any changed, missing, or
  * duplicated row ⇒ different checksum.
  */
class ChecksumsSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")

  private def sum(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    val r = Checksums.table(df, Seq("id", "v")).collect().head
    (r.getAs[Long]("n_rows"), r.getAs[String]("checksum"))
  }

  test("order- and partitioning-independent") {
    assert(sum(base) == sum(base.orderBy($"v".desc).repartition(7)))
  }

  test("detects a changed row") {
    val changed = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "v")
    assert(sum(base)._2 != sum(changed)._2)
  }

  test("detects a dropped and a duplicated row (count may even match)") {
    val dropDup = Seq((1L, "a"), (3L, "c"), (3L, "c")).toDF("id", "v")
    assert(sum(dropDup)._1 == sum(base)._1)
    assert(sum(dropDup)._2 != sum(base)._2)
  }

  test("an empty table checksums to the stable string \"0\", never NULL") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    val r = Checksums.table(empty, Seq("id", "v")).collect().head
    assert(r.getAs[Long]("n_rows") == 0L)
    // NULL here made two identical EMPTY tables reconcile as a mismatch
    // (NULL = NULL is not true)
    assert(r.getAs[String]("checksum") == "0")
  }

  test("Md5Prefix48 kernel == portable conv/substring/md5 formulation") {
    import org.apache.spark.sql.functions._
    // Unicode (multi-byte UTF-8), empty, whitespace, long strings, and a
    // NULL column exercising the chr(0) canonicalization — the codegen
    // kernel must be bit-for-bit the formulation the DuckDB oracle runs.
    val rows = Seq(
      (Some("héllo wörld 你好"), Some(42L)),
      (Some(""), Some(0L)),
      (Some("   "), None),
      (None, Some(-7L)),
      (Some("x" * 10000), Some(Long.MaxValue)),
      (None, None)
    ).toDF("s", "k")
    val cols = Seq($"s", $"k")
    val joined = concat_ws("~",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*)
    val got = rows.select(
      Checksums.rowHash48(cols).as("fast"),
      conv(substring(md5(joined), 1, 12), 16, 10).cast("long").as("portable"))
    assert(got.where($"fast" =!= $"portable" ||
      $"fast".isNull =!= $"portable".isNull).count() == 0L)
    // Sanity: values are non-degenerate 48-bit (distinct across rows).
    assert(got.select($"fast").distinct.count() == 6L)
  }
}
