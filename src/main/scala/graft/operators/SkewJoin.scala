package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted replicate join for joins whose KEY DISTRIBUTION, not data volume,
  * is the bottleneck: one hot key funnels its whole partition through a
  * single task while 999 executors idle.
  *
  * AQE's skew-join handles most cases at runtime by splitting oversized
  * partitions — prefer it (it's on in [[graft.core.Sessions.local]]).
  * Reach for explicit salting when AQE can't: aggregation-before-join
  * barriers, deterministic-partitioning requirements, or skew known ahead
  * of time (the reference's salting utility, utils/spark.py:142-147, is
  * the write-distribution cousin of this).
  *
  * Mechanics: the skewed (big) side gets a random salt in [0, buckets);
  * the other side is replicated `buckets`× with every salt value; the join
  * key becomes (key, salt), splitting each hot key across `buckets` tasks.
  * Cost: small side ships `buckets`× — size the bucket count to the skew
  * ratio, not higher. Correctness is unchanged: every (left, right) key
  * pair still meets exactly once (left rows carry ONE salt, right rows ALL
  * salts).
  */
object SkewJoin {

  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // Only join types where the REPLICATED side never emits unmatched rows
    // are salt-safe: right/full outer would surface each right row once per
    // replica.
    val safe = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(safe.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin cannot preserve '$joinType' semantics: the replicated " +
        "side would emit unmatched rows once per salt bucket")
    // Reserved-column guard (AsOfJoin/Ranked posture): a pre-existing
    // __salt on either input would be silently replaced and then dropped
    // after the join — the caller's column vanishes with no error.
    require(!skewed.columns.contains("__salt") &&
        !other.columns.contains("__salt"),
      "__salt is reserved by saltedJoin; rename the input column")
    val salted = skewed.withColumn("__salt",
      floor(rand(seed = 42) * buckets).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<int>")))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
