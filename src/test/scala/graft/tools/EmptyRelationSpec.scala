package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSession}

/** SQL-standard empty-relation semantics for the grouping-sets family.
  *
  * Spark's cube/rollup/GROUPING SETS over an EMPTY input emit zero rows;
  * the SQL standard (and the DuckDB oracle) emits the () grouping-set row
  * with COUNT 0 and NULL sums. q57/q49/q98 close the divergence with a
  * correction branch — a global aggregate (which always yields one row)
  * kept only when its count is 0 — unioned over the same partials
  * exchange. This spec runs the real query functions against limit(0)
  * copies of their input tables and pins the corrected behavior; the
  * one-fact-pass property is pinned in PlanRegressionSpec.
  */
class EmptyRelationSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-sf").toString
    for (t <- Seq("lineitem", "orders", "customer", "nation", "region"))
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

  for (q <- Seq("q57_cube", "q49_rollup", "q98_grouping_sets"))
    test(s"$q over an empty input emits exactly the () row (COUNT 0, NULL sums)") {
      val out = SparkEntry.queries(q)(spark, emptyDir).collect()
      assert(out.length == 1, s"expected the single global row, got ${out.toSeq}")
      val r = out.head
      assert(r.isNullAt(0) && r.isNullAt(1), "group columns must be NULL")
      assert(r.isNullAt(2), "sum over empty input must be NULL")
      assert(r.getLong(3) == 0L, "count over empty input must be 0")
      assert(r.getInt(4) == 3, "grouping_id must mark both keys grouped-out")
    }

  test("non-empty input: correction branch contributes nothing (row parity)") {
    // The cube over real sf0.001 data must have exactly one gid=3 row —
    // from the cube itself, with the correction arm filtered out.
    val out = SparkEntry.queries("q57_cube")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.count(_.getInt(4) == 3) == 1)
    assert(out.forall(r => r.getLong(3) > 0L))
  }
}
