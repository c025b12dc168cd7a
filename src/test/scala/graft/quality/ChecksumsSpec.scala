package graft.quality

import graft.SparkSpec

/** The reconciliation property: identical content ⇒ identical checksum
  * regardless of row order/partitioning; any changed, missing, or
  * duplicated row ⇒ different checksum.
  */
class ChecksumsSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")

  private def sum(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    val r = Checksums.table(df, Seq("id", "v")).collect().head
    (r.getAs[Long]("n_rows"), r.getAs[String]("checksum"))
  }

  test("order- and partitioning-independent") {
    assert(sum(base) == sum(base.orderBy($"v".desc).repartition(7)))
  }

  test("detects a changed row") {
    val changed = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "v")
    assert(sum(base)._2 != sum(changed)._2)
  }

  test("detects a dropped and a duplicated row (count may even match)") {
    val dropDup = Seq((1L, "a"), (3L, "c"), (3L, "c")).toDF("id", "v")
    assert(sum(dropDup)._1 == sum(base)._1)
    assert(sum(dropDup)._2 != sum(base)._2)
  }
}
