package graft.quality

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.SparkSpec

class BadRecordsSpec extends SparkSpec {

  private val schema = new StructType()
    .add("id", LongType).add("name", StringType)

  test("splitJson quarantines unparseable lines, passes good rows") {
    val dir = Files.createTempDirectory("graft_bad")
    Files.writeString(dir.resolve("data.json"),
      """{"id": 1, "name": "ok"}
        |{not json at all
        |{"id": 2, "name": "fine"}
        |{"id": "shouldBeLong", "name": "typeclash"}
        |""".stripMargin)
    val (good, bad) = BadRecords.splitJson(spark, dir.toString, schema)
    val goodRows = rows(good).map(r => (r.getAs[Long]("id"), r.getAs[String]("name")))
    assert(goodRows.toSet == Set((1L, "ok"), (2L, "fine")))
    val badLines = rows(bad).map(_.getAs[String]("corrupt_line"))
    assert(badLines.size == 2)
    assert(badLines.exists(_.contains("not json")))
    assert(badLines.exists(_.contains("shouldBeLong")))
  }

  test("splitCsv quarantines rows that fail the schema") {
    val dir = Files.createTempDirectory("graft_bad_csv")
    Files.writeString(dir.resolve("data.csv"),
      "1,alpha\nnotanumber,beta\n3,gamma\n")
    val (good, bad) = BadRecords.splitCsv(spark, dir.toString, schema)
    assert(rows(good).map(_.getAs[Long]("id")).toSet == Set(1L, 3L))
    assert(rows(bad).map(_.getAs[String]("corrupt_line")) == Seq("notanumber,beta"))
  }
}
