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

  test("interleave2Sql renders the same formula as text") {
    val sql = ZOrder.interleave2Sql("a", "b", 2)
    assert(sql.contains("((a >> 0) & 1) << 0"))
    assert(sql.contains("((b >> 1) & 1) << 3"))
    assert(sql.startsWith("(") && sql.endsWith(")"))
  }
}
