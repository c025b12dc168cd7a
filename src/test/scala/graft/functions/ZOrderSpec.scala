package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)

  test("interleave2 matches the reference Morton computation") {
    import spark.implicits._
    val pts = for (x <- 0L to 7L; y <- 0L to 7L) yield (x, y)
    val got = rows(pts.toDF("x", "y")
        .select(col("x"), col("y"),
          ZOrder.interleave2(col("x"), col("y"), 3).as("z")))
      .map(r => ((r.getAs[Long]("x"), r.getAs[Long]("y")), r.getAs[Long]("z")))
      .toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x, y, 3), s"($x,$y)")
    }
    // distinct inputs → distinct keys within the bit budget
    assert(got.values.toSeq.distinct.size == pts.size)
  }

  test("clusterByZ orders rows by the Morton key across partitions") {
    import spark.implicits._
    val df = (0L until 64L).map(i => (i % 8, i / 8)).toDF("x", "y")
    val clustered = ZOrder.clusterByZ(df, col("x"), col("y"), 3, numPartitions = 4)
    val zs = rows(clustered.select(col("x"), col("y")))
      .map(r => morton(r.getAs[Long]("x"), r.getAs[Long]("y"), 3))
    // repartitionByRange + sortWithinPartitions = globally nondecreasing
    // when read back partition by partition
    val perPart = clustered
      .select(spark_partition_id().as("p"), col("x"), col("y")).collect()
      .groupBy(_.getAs[Int]("p"))
    val ranges = perPart.toSeq.sortBy(_._1).map { case (_, rs) =>
      val ms = rs.map(r => morton(r.getAs[Long]("x"), r.getAs[Long]("y"), 3))
      (ms.min, ms.max)
    }
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo, "partition z-ranges overlap")
      case _ =>
    }
    assert(zs.toSet.size == 64)
  }

  test("clusterByZ refuses a pre-existing __z column instead of dropping it") {
    import spark.implicits._
    val df = Seq((1L, 2L, "user-data")).toDF("x", "y", "__z")
    val e = intercept[IllegalArgumentException] {
      ZOrder.clusterByZ(df, col("x"), col("y"), bits = 8, numPartitions = 2)
    }
    assert(e.getMessage.contains("__z"))
  }

  test("interleave2Sql renders the same formula as text") {
    val sql = ZOrder.interleave2Sql("a", "b", 2)
    assert(sql.contains("((CAST(a AS BIGINT) >> 0) & 1) << 0"))
    assert(sql.contains("((CAST(b AS BIGINT) >> 1) & 1) << 3"))
    assert(sql.startsWith("(") && sql.endsWith(")"))
  }

  test("interleave2 stays injective and non-negative past bit 15 on INT inputs") {
    import spark.implicits._
    // Pre-widening, IntegerType inputs hit 32-bit shift semantics at
    // bits >= 16: y's bit 15 landed in the int sign bit and higher
    // positions wrapped mod 32, colliding distinct pairs. bits=20 over
    // values near 2^20 exercises exactly that band.
    val vals = Seq(0, 1, 65535, 65536, 524287, 524288, 1048575)
    val pairs = for (a <- vals; b <- vals) yield (a, b)
    val zs = pairs.toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y"), 20).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.distinct.length == pairs.length, "Morton keys must not collide")
    assert(zs.forall(z => z >= 0 && z < (1L << 40)), "keys must stay in [0, 2^40)")
    // And the SQL twin computes the identical keys.
    val viaSql = pairs.toDF("x", "y")
      .selectExpr(ZOrder.interleave2Sql("x", "y", 20) + " AS z")
      .collect().map(_.getLong(0))
    assert(viaSql.toSeq == zs.toSeq)
  }
}
