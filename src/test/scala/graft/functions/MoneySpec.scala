package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-stage long-cents aggregation must equal the decimal-typed
  * formulation digit-for-digit — it replaces it in the money queries.
  */
class MoneySpec extends SparkSpec {
  import spark.implicits._

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  test("sumUnitsExact == decimal groupBy sums across many partitions") {
    // 2dp money values incl. ones whose double representation is inexact
    // (0.07, 0.29) and a group spread over every partition.
    val rows = (1 to 20000).map { i =>
      (if (i % 3 == 0) "a" else "b", (i % 997) + (i % 100) / 100.0)
    }
    val df = rows.toDF("k", "v").repartition(13)
    val fast = Money.sumUnitsExact(df, Seq("k"),
        Seq("sv" -> Money.cents(col("v"))), countAs = Some("n"))
      .select(col("k"), (col("sv").cast("double") / 100.0).as("sv"), col("n"))
    val slow = df.groupBy(col("k"))
      .agg(sum(dec(col("v"))).cast("double").as("sv"), count(lit(1)).as("n"))
    assert(fast.exceptAll(slow).count() == 0L &&
      slow.exceptAll(fast).count() == 0L)
  }

  test("cents recovers exact cents for inexact doubles") {
    val got = Seq(0.07, 0.29, 104999.91, 0.0, 1.0)
      .toDF("v").select(Money.cents(col("v")).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L, 29L, 10499991L, 0L, 100L))
  }

  test("chunkBy (deterministic hash chunking) totals match the positional path") {
    // Shuffle-fed callers chunk by content hash instead of the row-order-
    // sensitive monotonically_increasing_id (retry determinism — see
    // partialUnits doc). Totals must be identical either way: sums
    // reassociate exactly over any finer grouping.
    val rows = (1 to 20000).map { i =>
      (if (i % 3 == 0) "a" else "b", i.toLong, (i % 997) + (i % 100) / 100.0)
    }
    val df = rows.toDF("k", "id", "v").repartition(13)
    def run(chunkBy: Option[org.apache.spark.sql.Column]) =
      Money.sumUnitsExact(df, Seq("k"),
          Seq("sv" -> Money.cents(col("v"))), countAs = Some("n"),
          chunkBy = chunkBy)
        .select(col("k"), col("sv").cast("string").as("sv"), col("n"))
    val a = run(None)
    val b = run(Some(col("id")))
    assert(a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L)
    // and the hash chunk genuinely fans out the partials
    val nPartials = Money.partialUnits(df, Seq("k"),
      Seq("sv" -> Money.cents(col("v"))), chunkBy = Some(col("id"))).count()
    assert(nPartials > 26, s"hash chunking should split partials, got $nPartials")
  }

  test("decimal combine is exact past the long ceiling (the 100 TB claim)") {
    // 24 rows of ~9.2e17 units spread over 8 partitions: every
    // per-partition partial stays under 2^63 (≤3 rows × 9.2e17 ≈ 2.8e18),
    // but the GROUP total (~2.2e19) exceeds Long.MaxValue — a naive long
    // sum would wrap silently. The decimal(38,0) combine must report the
    // exact BigInt total.
    val unit = 920000000000000000L // 9.2e17
    val df = (1 to 24).map(_ => ("g", unit)).toDF("k", "u").repartition(8)
    val got = Money.sumUnitsExact(df, Seq("k"), Seq("s" -> col("u")))
      .select(col("s").cast("string")).collect().head.getString(0)
    assert(got == (BigInt(unit) * 24).toString)
    assert(BigInt(got) > BigInt(Long.MaxValue), "test must actually cross 2^63")
  }
}
