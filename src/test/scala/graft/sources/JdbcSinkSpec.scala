package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S13 JDBC sink against embedded Derby (ships with Spark for the Hive
  * metastore) — the same `format("jdbc")` path serves Postgres at scale
  * (reference: clinical_trial_etl.py:53-66), with the pre-write key
  * repartition policy applied. */
class JdbcSinkSpec extends SparkSpec {

  test("writeJdbc round-trips through embedded Derby with a repartition policy") {
    val dbDir = Files.createTempDirectory("graft_derby")
    System.setProperty("derby.system.home", dbDir.toString)
    val url = s"jdbc:derby:$dbDir/testdb;create=true"
    val props = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")

    val df = graft.core.Tables.load(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    DataWriter.writeJdbc(df, url, "nations", props,
      policy = RepartitionPolicy.ByColumns(Seq("n_regionkey"), Some(2)))

    val back = spark.read.format("jdbc")
      .options(props + ("url" -> url, "dbtable" -> "nations")).load()
    assert(back.count() == df.count())
    assert(back.columns.map(_.toLowerCase).toSet ==
      Set("n_nationkey", "n_name", "n_regionkey"))
    // overwrite mode really replaces (not appends)
    DataWriter.writeJdbc(df.limit(5), url, "nations", props)
    val again = spark.read.format("jdbc")
      .options(props + ("url" -> url, "dbtable" -> "nations")).load()
    assert(again.count() == 5)
  }
}
