package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.Stats
import graft.sampling.Sampling

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymity sizes classes, flags < k, and prices risk in ppm") {
    val df = (Seq.fill(12)(("A", 1)) ++ Seq.fill(3)(("A", 2)) ++
      Seq.fill(10)(("B", 1))).toDF("seg", "nat")
    val got = Privacy.kAnonymity(df, Seq("seg", "nat"), k = 10L)
      .select("seg", "nat", "n", "violates", "risk_ppm")
      .as[(String, Int, Long, Boolean, Long)].collect().toSet
    assert(got == Set(("A", 1, 12L, false, 83333L),
      ("A", 2, 3L, true, 333333L), ("B", 1, 10L, false, 100000L)))
  }

  test("balanceSources keeps small sources whole and downsamples the giant") {
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (901 to 1000).map(i => (i.toLong, "small"))).toDF("id", "source")
    val kept = Sampling.balanceSources(df, col("source"), col("id"))
    val bySrc = kept.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(bySrc("small") == 100L) // at/below equal share: kept whole
    // big: rate = 1000·1e6 div (2·900) ≈ 55.5% — hash noise aside, well
    // below the original 900 and nowhere near zero
    assert(bySrc("big") > 300L && bySrc("big") < 700L)
    // subset-monotone determinism: same result on a different partitioning
    val again = Sampling.balanceSources(df.repartition(7), col("source"),
      col("id")).select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
  }

  test("hashSample keeps NULL-keyed rows: a 100% sample loses nothing") {
    import spark.implicits._
    import graft.sampling.Sampling
    // Pre-fix, h31(NULL) was NULL and `NULL % 100 < pct` filtered the row
    // out at EVERY rate — a "100% sample" silently lost NULL-keyed rows.
    val df = Seq(Some("a"), Some("b"), None, None).toDF("k")
    assert(Sampling.hashSample(df, col("k"), 100).count() == 4L)
    // NULL keys form ONE coherent hash key: all-in or all-out per rate.
    val nulls = Sampling.hashSample(df, col("k"), 50)
      .filter(col("k").isNull).count()
    assert(nulls == 0L || nulls == 2L)
  }

  test("weightedSample gives NULL-keyed rows a real priority") {
    import spark.implicits._
    import graft.sampling.Sampling
    // A NULL key used to make priority NULL (never sampled in Spark,
    // always first in DuckDB's nulls-first desc) — now it hashes via the
    // sentinel like every other sampler in the family.
    val df = Seq((Some("a"), 1.0), (Option.empty[String], 1.0)).toDF("k", "w")
    val got = Sampling.weightedSample(df, col("k"), col("w"), 2)
    assert(got.count() == 2L, "both rows must be sampleable")
    assert(got.filter(col("priority").isNull).count() == 0L,
      "NULL-keyed rows must carry a real priority")
  }

  test("benford reads leading digits from decimal strings, exact ppm") {
    val df = Seq(123L, 19L, 2L, 25L, 999L, 0L, 1L).toDF("y") // 0 excluded
    val got = Stats.benford(df, col("y"))
      .select("digit", "n", "observed_ppm", "expected_ppm")
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(got == Set((1, 3L, 500000L, 301030L), (2, 2L, 333333L, 176091L),
      (9, 1L, 166666L, 45757L)))
  }
}
