package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge-list DataFrames — the shapes that
  * stay join-expressible at cluster scale (each iteration/enumeration is a
  * hash equi-join on node ids, so Catalyst partitions by key and AQE
  * handles hub skew). Complements q44's connected components (pointer
  * jumping) and q97's recursive-CTE BFS.
  */
object Graph {

  /** Edge-count ceiling for [[triangles]]' broadcast hints: 5M canonical
    * edges ≈ 80 MB of (long, long) rows — comfortably under the 8 GB
    * broadcast cap and a 4 GB executor heap with room for the hash
    * relation's overhead. */
  val BroadcastMaxEdges: Long = 5000000L

  /** Triangle enumeration on an undirected graph, given a DIRECTED edge
    * list: edges are first canonicalized to least<greatest and
    * de-duplicated, then triangles (u < v < w) are enumerated via two
    * hash joins — the ordering constraint counts each triangle exactly
    * once and keeps the join tree acyclic. At scale the standard
    * degree-ordering refinement (orient edges low-degree → high-degree)
    * bounds the intermediate wedge count; the enumeration shape is
    * unchanged. */
  def triangles(edges: DataFrame): DataFrame = {
    // The canonical edge set is referenced three times below; materialize
    // it once or the whole upstream edge derivation runs 3× (measured 3×
    // cost at sf0.1 on the trade graph).
    val und = edges.select(
      least(col("src"), col("dst")).as("u"),
      greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    // Broadcast the closing sides ONLY under a size gate: checkpointed
    // inputs carry no size stats, so the static planner would pick
    // sort-merge even for a tiny edge set — but an UNCONDITIONAL broadcast
    // hint is a hard instruction, and a multi-GB edge set would hit the
    // 8 GB broadcast cap / executor heap as a cliff. The count is one
    // cheap job over already-checkpointed blocks. Past the gate the joins
    // shuffle and AQE plans them; for billion-edge graphs also pre-filter
    // by degree orientation.
    val edgeCount = und.count()
    def maybeBcast(df: DataFrame): DataFrame =
      if (edgeCount <= BroadcastMaxEdges) broadcast(df) else df
    val uv = und
    val vw = maybeBcast(und.select(col("u").as("v2"), col("v").as("w")))
    val uw = maybeBcast(und.select(col("u").as("u3"), col("v").as("w3")))
    uv.join(vw, col("v") === col("v2"))
      .join(uw, col("u") === col("u3") && col("w") === col("w3"))
      .select(col("u"), col("v"), col("w"))
  }

  /** PageRank by power iteration, all-integer so two engines agree bit-for-
    * bit: ranks live in ppm (Σ ≈ 1e6), damping is 850/1000, and every
    * division is integer `div` in a FIXED shape —
    * contrib(u→v) = (850·pr_u·w_uv) div (1000·outw_u),
    * pr'_v = (150000 div N) + Σ contrib. Truncation loss (the classic
    * float-PageRank drift, here made explicit) stays bounded and identical
    * across engines and partitionings — reproducibility the double-valued
    * formulation can't give. The unit bounds the graph: |V| ≤ 1e6 is
    * required (per-node ppm resolution; see the require below), and above
    * ~150k nodes the teleport term truncates to 0 so long iteration
    * chains decay toward the truncation floor — pick a finer unit (in
    * lockstep with the oracle) for graphs near the bound.
    *
    * Dangling-node simplification: nodes that appear only as `dst` have no
    * out-edges, so the rank mass flowing INTO them is not redistributed —
    * 85% of a sink's rank leaks each iteration, and on graphs with sinks
    * Σ pr_ppm lands well below 1e6 (the "Σ ≈ 1e6, truncation-only loss"
    * contract holds only for sink-free graphs, which the gated q112/q113
    * inputs are). The standard fix — add Σ_dangling·850 div 1000 uniformly
    * per iteration — costs one extra 1-row aggregate+cross-join per round;
    * callers that need mass conservation on sinky graphs should request
    * that variant rather than assume it here.
    *
    * Each iteration is one equi-join (edges ⋈ ranks on src, ranks
    * broadcast when |nodes| ≪ |edges|) + one hash-agg on dst. The edge
    * list with out-weights is localCheckpoint'd once so iterations join a
    * materialized input instead of re-running the upstream derivation —
    * same lesson as q97's materialize-before-loop. */
  def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
    val outw = e0.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val e = e0.join(outw, "src").localCheckpoint(true)
    // Small-graph fast path (r12; the dupClusters driver-shortcut posture):
    // the ppm unit already caps |V| at 1e6, and real small graphs (the
    // nation-level trade digraph) have edge sets that fit a driver collect
    // trivially — where the distributed loop pays iters × (broadcast join
    // + hash agg + rank-vector checkpoint) in tiny jobs, a single bounded
    // collect of the MATERIALIZED e plus an exact BigInteger replay of the
    // same truncating integer arithmetic produces bit-identical ranks in
    // one task (q113 0.81→0.45s same-session; parity spec'd per graph
    // family in GraphSpec and forced distributed suite-wide by the
    // all-twins gate). Conditions for the shortcut, each checked from the
    // one collected buffer (no second evaluation, no TOCTOU): integral
    // node ids, every (src, dst, w) non-null — the distributed loop gives
    // NULL keys/weights its join/agg semantics, which the kernel does not
    // reimplement — and the edge count under the session-overridable guard.
    val srcT = e.schema("src").dataType
    val dstT = e.schema("dst").dataType
    // srcT == dstT keeps the kernel's output node type identical to the
    // distributed union's coerced type without reimplementing coercion
    val integral = srcT == dstT && Seq(srcT, dstT).forall(t =>
      t == org.apache.spark.sql.types.LongType ||
        t == org.apache.spark.sql.types.IntegerType ||
        t == org.apache.spark.sql.types.ShortType)
    val lim = math.min(graft.core.Gates.effectiveLimit(edges.sparkSession,
      graft.core.Gates.GraphDriverEdgeLimit, 2000000L),
      (Int.MaxValue - 1).toLong) // a raised guard must not wrap limit+1
    // Gate on a cheap count() BEFORE collecting (r13, dupClusters' pattern):
    // the limit(lim+1) collect alone would pull up to lim+1 rows (default
    // 2,000,001 × 4 long cols — a multi-hundred-MB transient driver
    // allocation) for every integral-typed graph just to discover an
    // oversize graph doesn't qualify. `e` is localCheckpoint'd (immutable),
    // so count-then-collect has no TOCTOU and the collect runs only when
    // the kernel will actually be attempted.
    if (integral && lim > 0 && e.count() <= lim) {
      val buf = e.select(col("src").cast("long"), col("dst").cast("long"),
          col("w"), col("outw"))
        .collect()
      val clean =
        buf.forall(r => !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2) &&
          !r.isNullAt(3))
      if (clean) {
        val spark = edges.sparkSession
        import spark.implicits._
        val nodeSet = scala.collection.mutable.SortedSet.empty[Long]
        buf.foreach { r => nodeSet += r.getLong(0); nodeSet += r.getLong(1) }
        val nN = nodeSet.size.toLong
        if (nN == 0L)
          return spark.emptyDataset[(Long, Long)].toDF("node", "pr_ppm")
            .select(col("node").cast(srcT).as("node"), col("pr_ppm"))
        require(nN <= 1000000L,
          s"pagerank's integer-ppm formulation cannot represent per-node " +
            s"rank for |V| = $nN > 1e6 (init would truncate to 0 ppm for " +
            "every node). Rescale the unit (e.g. per-billion) together " +
            "with the reconciliation oracle for graphs this large.")
        val base = 150000L / nN
        var pr = nodeSet.iterator.map(_ -> BigInt(1000000L / nN)).toMap
        for (_ <- 1 to iters) {
          val inflow = scala.collection.mutable.HashMap.empty[Long, BigInt]
          buf.foreach { r =>
            val (s, d, w, ow) =
              (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
            // exact replay of the decimal(38,0) `div`: non-negative
            // operands, so BigInt's truncating / is the same floor
            if (ow != 0L) {
              val c = (BigInt(850) * pr(s) * BigInt(w)) /
                (BigInt(1000) * BigInt(ow))
              inflow(d) = inflow.getOrElse(d, BigInt(0)) + c
            }
          }
          pr = nodeSet.iterator.map(n =>
            n -> (BigInt(base) + inflow.getOrElse(n, BigInt(0)))).toMap
        }
        return nodeSet.iterator.map(n => (n, pr(n).toLong)).toSeq
          .toDF("node", "pr_ppm")
          .select(col("node").cast(srcT).as("node"), col("pr_ppm"))
      }
    }
    // Derive nodes from the MATERIALIZED e, not e0 — reading e0 again
    // would re-run the caller's whole edge derivation a second time.
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val nN = nodes.count() // scalar metadata (|V|), not a data collect
    if (nN == 0) // empty graph → empty ranks (not a driver-side div-by-zero)
      return nodes.withColumn("pr_ppm", lit(0L)).select(col("node"), col("pr_ppm"))
    // Representation limit of the ppm unit, enforced loudly: at |V| > 1e6
    // the uniform init 1e6 div |V| is 0 ppm and every iteration stays 0 —
    // total silent collapse, not the documented bounded truncation. (And
    // from |V| > 150k the teleport term 150000 div |V| is already 0, so
    // rank mass decays toward the truncation floor each iteration.) A
    // larger graph needs a larger integer unit — which changes emitted
    // values, i.e. the cross-engine contract — so it must be a deliberate
    // caller/oracle change, not an automatic one here.
    require(nN <= 1000000L,
      s"pagerank's integer-ppm formulation cannot represent per-node rank " +
        s"for |V| = $nN > 1e6 (init would truncate to 0 ppm for every " +
        "node). Rescale the unit (e.g. per-billion) together with the " +
        "reconciliation oracle for graphs this large.")
    val base = 150000L / nN
    var pr = nodes.withColumn("pr", lit(1000000L / nN))
    // The rank vector is |V| rows against |E| edges — broadcast it (the
    // checkpointed inputs have no stats, so the static planner would
    // sort-merge otherwise). A graph whose rank vector can't broadcast
    // needs the partitioned-join variant; same loop, no hints.
    for (_ <- 1 to iters) {
      val contrib = e.join(broadcast(pr.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node"),
          // decimal(38,0) products: 850 * pr(ppm) * w overflows LONG for
          // micro-unit edge weights past ~2.5e10 (silent wrap non-ANSI, a
          // job abort under ANSI); the decimal product divs exactly and
          // the quotient is back under the ppm unit. A node whose weights
          // sum to 0 divs to NULL and its outflow leaks like a dangling
          // node (documented teleport-mass behavior).
          expr("(cast(850 as decimal(38,0)) * pr * w)" +
            " div (cast(1000 as decimal(38,0)) * outw)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      // Materialize each iteration's rank vector: broadcast builds execute
      // their input plan, so an unchecked lineage re-runs iteration k's
      // joins once per LATER iteration (plus once in the final job) —
      // quadratic job count in `iters`. The vector is |V| rows (already
      // required to broadcast), so the eager checkpoint is one tiny job.
      // At the nation-graph scale this is measured-neutral (the job floor
      // dominates); it matters when iters or |V| grow.
      pr = nodes.join(broadcast(contrib), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("pr"))
        .localCheckpoint(true)
    }
    pr.select(col("node"), col("pr").as("pr_ppm"))
  }
}
