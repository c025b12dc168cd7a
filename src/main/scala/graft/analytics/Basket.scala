package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence: which items appear together in the same
  * order more often than independence predicts. The naive formulation
  * self-joins the (order, item) projection with itself — two shuffles on
  * the order key, another for the item supports, another for the order
  * count. Here one repartition on the order key feeds a fused emission of
  *   pair rows   (ka = pa, kb = pb)   via generator chains over baskets
  *   item rows   (ka = p,  kb = NULL) via the per-partition distinct
  *   one marker  (ka = NULL, kb = NULL)   — one per order
  * so a single `groupBy(ka, kb)` produces pair counts, item supports and
  * the order count in the same shuffle. That aggregate is persisted
  * (MEMORY_AND_DISK): the pair/support/order-count consumers are three
  * differently-filtered reads of one cached table, so the scan, the
  * repartition, the pair expansion and the final merge each run exactly
  * once — without the cache, Catalyst slices the aggregate per consumer
  * and either re-merges the full pair table three times (pushdown
  * barrier) or re-scans the input per slice (pushdown), both measurably
  * slower at sf0.1 and strictly worse at warehouse scale where the merge
  * input is billions of pairs. All counts and the lift ratio stay
  * integer (lift in ppm via decimal-product div), so the result is
  * engine- and partitioning-independent.
  */
object Basket {

  /** Co-purchase pairs (pa < pb) with support and integer-ppm lift:
    * lift = P(ab) / (P(a)·P(b)) = n_ab·N / (n_a·n_b), emitted as
    * (n_ab·N·1e6) div (n_a·n_b). `minItemSupport` drops pairs involving
    * rare items; `minPairSupport` bounds the output. */
  def copurchaseLift(df: DataFrame, orderCol: String, itemCol: String,
                     minItemSupport: Long, minPairSupport: Long): DataFrame = {
    // Repartition on the order key ONCE; hashpartitioning(o) satisfies the
    // clustering requirement of every downstream grouping whose keys
    // contain o — groupBy(o) for baskets, groupBy(o, p) for the distinct —
    // so all three emission branches hang off the same (reused) exchange.
    val op = df.select(col(orderCol).as("o"), col(itemCol).as("p"))
      .repartition(col("o"))
    val baskets = op
      .groupBy(col("o"))
      .agg(sort_array(collect_set(col("p"))).as("items"))
    // Pair generation stays in codegen'd generators (posexplode + slice
    // explode), not array HOFs: measured ~2× faster at sf0.1, and resident
    // memory per task is O(basket) — the slice for outer position ki is
    // one ≤k-element array, never the k²/2 pair set, so one adversarial
    // giant basket degrades to quadratic TIME (inherent in its pair
    // count) without a quadratic allocation. The sorted array gives
    // pa < pb by position, no comparison filter needed.
    val pairRows = baskets
      .select(col("items"), posexplode(col("items")).as(Seq("ki", "ka")))
      .select(col("ka"),
        explode(expr("slice(items, ki + 2, size(items) - ki - 1)")).as("kb"))
    // Item rows come from the per-partition DISTINCT (a keys-only hash
    // agg — no array allocation, unlike collect_set); neither aux branch
    // needs the basket arrays, so the collect_set runs once, for the pair
    // branch only. Markers (one per order) stack a count agg on the SAME
    // dist node rather than on `op`: a direct groupBy(o) would let column
    // pruning narrow its scan to l_orderkey alone, splitting the branch
    // onto a second scan + exchange. The where(cnt > 0) is always true
    // but keeps dist's output referenced — otherwise
    // RemoveRedundantAggregates collapses distinct(o)-over-distinct(o,p)
    // to distinct(o) and re-splits the scan the same way.
    val dist = op.groupBy(col("o"), col("p")).agg(count(lit(1)).as("cnt"))
    // NULL placeholders must carry the item column's own type, or the
    // unionAll with pairRows type-mismatches for non-bigint item keys.
    val itemType = op.schema("p").dataType
    val nullKey = lit(null).cast(itemType)
    val itemRows = dist
      .select(col("p").as("ka"), nullKey.as("kb"))
    val markerRows = dist.where(col("cnt") > 0)
      .groupBy(col("o")).agg(count(lit(1)))
      .select(nullKey.as("ka"), nullKey.as("kb"))
    val auxRows = itemRows.unionAll(markerRows)
    // The cache point (see scaladoc): one shuffle produces pair counts,
    // item supports and the order count together; the cached merge result
    // is what the three consumers filter. MEMORY_AND_DISK because the
    // unfiltered pair aggregate is the largest intermediate of the query —
    // it must spill, not OOM, under an adversarial basket-size
    // distribution.
    val agg = pairRows.unionAll(auxRows)
      .groupBy(col("ka"), col("kb")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = agg
      .where(col("ka").isNotNull && col("kb").isNotNull && col("n") >= minPairSupport)
      .select(col("ka").as("pa"), col("kb").as("pb"), col("n").as("n_ab"))
    val item = agg.where(col("ka").isNotNull && col("kb").isNull &&
      col("n") >= minItemSupport)
    val nOrders = agg.where(col("ka").isNull).select(col("n").as("n_orders"))
    // A pair survives iff both items meet `minItemSupport`, and n_ab is
    // unaffected by when rare items are dropped, so attaching support via
    // inner join after the pair agg is equivalent to pre-filtering. The
    // frequent-item table is far smaller than the pair table — broadcast
    // it (drop the hint only if frequent items outgrow executor memory,
    // ~100M+ distinct items).
    pairs
      .join(broadcast(item.select(col("ka").as("pa"), col("n").as("n_a"))), "pa")
      .join(broadcast(item.select(col("ka").as("pb"), col("n").as("n_b"))), "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
        expr("cast(n_ab as decimal(38,0)) * n_orders * 1000000" +
          " div (cast(n_a as decimal(38,0)) * n_b)").as("lift_ppm"))
  }
}
