package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off decomposition of q97_recursive_reach's cost: edge derivation
  * (4-way fact join + rank) vs the recursive walk itself. Diagnostic
  * only — not part of the library surface.
  */
object Q97Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    Seq("lineitem", "orders", "customer", "supplier").foreach(n =>
      graft.core.Tables.load(s, sfDir, n).createOrReplaceTempView(s"g5_$n"))

    (1 to 3).foreach { rep =>
      System.err.println(s"--- rep $rep ---")
      val edges = time("edges(derive+checkpoint)") {
        s.sql("""
          WITH e AS (
            SELECT c.c_nationkey AS src, sp.s_nationkey AS dst, COUNT(*) AS n
            FROM g5_lineitem l
            JOIN g5_orders o ON l.l_orderkey = o.o_orderkey
            JOIN g5_customer c ON o.o_custkey = c.c_custkey
            JOIN g5_supplier sp ON l.l_suppkey = sp.s_suppkey
            WHERE c.c_nationkey <> sp.s_nationkey
            GROUP BY 1, 2),
          ranked AS (
            SELECT src, dst, row_number() OVER (
              PARTITION BY src ORDER BY n DESC, dst ASC) AS r
            FROM e)
          SELECT src, dst FROM ranked WHERE r <= 3""").localCheckpoint(true)
      }
      edges.createOrReplaceTempView("g5_heavy")
      time("walk(recursive)") {
        s.sql("""
          WITH RECURSIVE walk(node, dist) AS (
            SELECT CAST(0 AS BIGINT), 0
            UNION ALL
            SELECT h.dst, w.dist + 1 FROM walk w
            JOIN g5_heavy h ON h.src = w.node WHERE w.dist < 5)
          SELECT CAST(node AS BIGINT) AS node, CAST(MIN(dist) AS INT) AS hops
          FROM walk GROUP BY node""")
          .write.format("noop").mode("overwrite").save()
      }
      edges.unpersist(false)
    }
    s.stop()
  }
}
