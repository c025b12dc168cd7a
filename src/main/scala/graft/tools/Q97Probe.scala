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

      def noop(sql: String): Unit =
        s.sql(sql).write.format("noop").mode("overwrite").save()

      // A: the shipped single-hop recursion (6 UnionLoop rounds).
      time("walk A: single-hop") {
        noop("""
          WITH RECURSIVE walk(node, dist) AS (
            SELECT CAST(0 AS BIGINT), 0
            UNION ALL
            SELECT h.dst, w.dist + 1 FROM walk w
            JOIN g5_heavy h ON h.src = w.node WHERE w.dist < 5)
          SELECT CAST(node AS BIGINT) AS node, CAST(MIN(dist) AS INT) AS hops
          FROM walk GROUP BY node""")
      }

      // B: anchor seeded with the 1-hop frontier (5 rounds).
      time("walk B: seeded anchor") {
        noop("""
          WITH RECURSIVE walk(node, dist) AS (
            SELECT CAST(0 AS BIGINT) AS node, 0 AS dist
            UNION ALL
            SELECT dst, 1 FROM g5_heavy WHERE src = 0
            UNION ALL
            SELECT h.dst, w.dist + 1 FROM walk w
            JOIN g5_heavy h ON h.src = w.node
            WHERE w.dist >= 1 AND w.dist < 5)
          SELECT CAST(node AS BIGINT) AS node, CAST(MIN(dist) AS INT) AS hops
          FROM walk GROUP BY node""")
      }

      // C: B with AQE off + 1 shuffle partition for the walk only — the
      // graph is ≤3·|nations| rows, so per-stage re-planning and 32-way
      // task fan-out are pure overhead.
      time("walk C: seeded, AQE off, 1 part") {
        s.conf.set("spark.sql.adaptive.enabled", "false")
        s.conf.set("spark.sql.shuffle.partitions", "1")
        try noop("""
          WITH RECURSIVE walk(node, dist) AS (
            SELECT CAST(0 AS BIGINT) AS node, 0 AS dist
            UNION ALL
            SELECT dst, 1 FROM g5_heavy WHERE src = 0
            UNION ALL
            SELECT h.dst, w.dist + 1 FROM walk w
            JOIN g5_heavy h ON h.src = w.node
            WHERE w.dist >= 1 AND w.dist < 5)
          SELECT CAST(node AS BIGINT) AS node, CAST(MIN(dist) AS INT) AS hops
          FROM walk GROUP BY node""")
        finally {
          s.conf.set("spark.sql.adaptive.enabled", "true")
          s.conf.set("spark.sql.shuffle.partitions", "32")
        }
      }

      // D: pointer-doubling {2,2,1}: doubled edge set (1- and 2-hop
      // steps), 3 productive rounds.
      time("walk D: pointer-doubling") {
        val doubled = s.sql("""
          SELECT src, dst, 1 AS w FROM g5_heavy
          UNION ALL
          SELECT a.src, b.dst, 2 AS w
          FROM g5_heavy a JOIN g5_heavy b ON a.dst = b.src""")
          .localCheckpoint(true)
        doubled.createOrReplaceTempView("g5_doubled")
        noop("""
          WITH RECURSIVE walk(node, dist) AS (
            SELECT CAST(0 AS BIGINT), 0
            UNION ALL
            SELECT h.dst, w.dist + h.w FROM walk w
            JOIN g5_doubled h ON h.src = w.node WHERE w.dist < 5
              AND w.dist + h.w <= 5)
          SELECT CAST(node AS BIGINT) AS node, CAST(MIN(dist) AS INT) AS hops
          FROM walk GROUP BY node""")
        doubled.unpersist(false)
      }

      // E: driver BFS over the collected ≤3·|nations|-row edge list —
      // the bounded-small-graph floor (what any engine would do).
      time("walk E: driver BFS") {
        val es = edges.collect().map(r =>
          (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
        val adj = es.groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
        val dist = scala.collection.mutable.Map(0L -> 0)
        var frontier = Seq(0L)
        var d = 0
        while (frontier.nonEmpty && d < 5) {
          d += 1
          frontier = frontier.flatMap(n => adj.getOrElse(n, Array.empty[Long]))
            .distinct.filter(n => !dist.contains(n) )
          frontier.foreach(n => dist(n) = d)
        }
        import s.implicits._
        dist.toSeq.toDF("node", "hops")
          .write.format("noop").mode("overwrite").save()
      }
      edges.unpersist(false)
    }
    s.stop()
  }
}
