package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers, per the standard ANN playbook:
  *  - [[bruteForceTopK]] — exact cosine top-k, the correctness baseline:
  *    broadcast the (small) query set against the (huge) corpus, score
  *    per-row inside codegen, keep k per query with a bounded window.
  *  - [[ivfAssign]] / [[ivfTopK]] — the scale path: assign every vector to
  *    its nearest centroid (broadcast argmin, no shuffle), then search only
  *    within the probed bucket(s), cutting the scored candidates by ~nlist×.
  *
  * All float math is widened to double and folded **sequentially left-to-
  * right** (`aggregate` over `zip_with`) so scores are deterministic and
  * bit-identical to the DuckDB oracle's `list_reduce` restatement — a
  * SIMD/tree-reduction dot product would be faster per-row but
  * non-reproducible across engines.
  */
object Similarity {

  /** Widen array<float> → array<double> (all scoring happens in double). */
  def toDoubleVec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product — deterministic summation order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 6 dp (rounding absorbs any last-ulp
    * divergence between engines' division). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Squared L2 distance, sequential fold. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (s, x) => s + x)

  /** Exact cosine top-k: every corpus row scored against every (broadcast)
    * query, then `row_number <= k` per query. The join is a broadcast
    * nested loop — no shuffle of the corpus; the window partitions by
    * query id so the rank shuffle is |queries|-wide, tiny.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), toDoubleVec(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), toDoubleVec(col(vecCol)).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF bucket assignment: nearest centroid by squared L2, argmin via a
    * left fold over the broadcast centroid array (per-row, zero shuffle).
    * `centroids` must be small enough to collect — at scale it comes from a
    * sampled k-means; here any small DataFrame of (id, vector) works.
    */
  def ivfAssign(df: DataFrame, centroids: Array[(Long, Array[Double])],
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Literal array of {cid, cvec} structs baked into the plan (ships once
    // per executor inside the serialized plan, like a broadcast).
    val centroidLit = array(centroids.map { case (cid, v) =>
      struct(lit(cid).as("cid"), array(v.map(lit): _*).as("cvec"))
    }: _*)
    val v = toDoubleVec(col(vecCol))
    val best = aggregate(
      centroidLit,
      struct(lit(-1L).as("cid"), lit(Double.MaxValue).as("d")),
      (acc, cen) => {
        val d = l2sq(v, cen.getField("cvec"))
        when(d < acc.getField("d"),
          struct(cen.getField("cid").as("cid"), d.as("d"))).otherwise(acc)
      })
    df.select(col(idCol), col(vecCol),
      best.getField("cid").as("cluster_id"),
      round(best.getField("d"), 6).as("cluster_dist"))
  }

  /** The IVF search path: score only vectors in the query's own bucket.
    * nprobe=1 for clarity; widen by unioning more buckets. */
  def ivfTopK(assigned: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(vecCol)).as("qv"), col("cluster_id").as("qc"))
    val c = assigned.select(col(idCol).as("neighbor_id"),
      toDoubleVec(col(vecCol)).as("cv"), col("cluster_id"))
    val scored = c.join(broadcast(q),
        col("qc") === col("cluster_id") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
