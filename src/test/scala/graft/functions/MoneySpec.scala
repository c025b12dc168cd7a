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
}
