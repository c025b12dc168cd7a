package graft.operators

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  test("saltedJoin equals the plain join and spreads the hot key") {
    import spark.implicits._
    // one hot key (90% of rows) + a long tail
    val left = (Seq.fill(900)(1L) ++ (2L to 101L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "lv")
    val right = (1L to 101L).map(k => (k, s"r$k")).toDF("k", "rv")

    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), buckets = 8)
      .select("k", "lv", "rv")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // the hot key's left rows really carry multiple salt values
    val salts = left.filter($"k" === 1L)
      .withColumn("__salt", org.apache.spark.sql.functions.floor(
        org.apache.spark.sql.functions.rand(seed = 42) * 8).cast("int"))
      .select("__salt").distinct().count()
    assert(salts > 1, "salting must spread the hot key over multiple buckets")
  }

  test("saltedJoin preserves left-join semantics for unmatched keys") {
    import spark.implicits._
    val left = Seq((1L, "a"), (5L, "lonely")).toDF("k", "lv")
    val right = Seq((1L, "r1")).toDF("k", "rv")
    val got = rows(SkewJoin.saltedJoin(left, right, Seq("k"), 4, "left")
      .select("k", "lv", "rv"))
    assert(got.length == 2)
    assert(got.exists(r => r.getLong(0) == 5L && r.isNullAt(2)))
  }
}
