package graft.pipelines

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

class ClinicalTrialSpec extends SparkSpec {

  private def doc(id: String, title: String, sponsors: Seq[String]): String =
    s"<study><nct_id>$id</nct_id><title>$title</title><sponsors>" +
      sponsors.map(s => s"<sponsor><name>$s</name></sponsor>").mkString +
      "</sponsors></study>"

  private def writeZip(dir: java.nio.file.Path, name: String,
                       docs: Map[String, String]): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(dir.resolve(name).toFile))
    docs.foreach { case (member, xml) =>
      zos.putNextEntry(new ZipEntry(member))
      zos.write(xml.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
  }

  test("incremental XML ingest -> CDC -> snapshot -> flatten -> warehouse") {
    val landing = Files.createTempDirectory("ct_landing")
    val base = Files.createTempDirectory("ct_base").toString
    val params = ClinicalTrial.Params(
      landingDir = landing.toString,
      stagingDir = s"$base/staging",
      warehouseDir = s"$base/warehouse",
      xmlSchema = StructType.fromDDL(
        "nct_id STRING, title STRING, " +
          "sponsors STRUCT<sponsor: ARRAY<STRUCT<name: STRING>>>"),
      pks = Seq("nct_id"))
    val transformations = Map(
      "studies" -> "SELECT nct_id, title FROM xmltable",
      "sponsors" ->
        """SELECT pk_nct_id AS nct_id, name FROM xmltable_sponsors_sponsor""")

    // Run 1: two chunks, three studies.
    writeZip(landing, "chunk1.zip", Map(
      "s1.xml" -> doc("NCT001", "alpha", Seq("acme", "umbrella")),
      "s2.xml" -> doc("NCT002", "beta", Seq("acme"))))
    writeZip(landing, "chunk2.zip", Map(
      "s3.xml" -> doc("NCT003", "gamma", Seq.empty)))
    val counts1 = ClinicalTrial.run(spark, params, runSeq = 1L, transformations,
      cascadeKeys = Seq(("nct_id", "pk_nct_id")))
    assert(counts1 == Map("studies" -> 3L, "sponsors" -> 3L))

    // Run 2: NCT002 retitled, NCT004 new, NCT001 unchanged — delta must be
    // exactly the changed + new docs, snapshot must show latest state.
    writeZip(landing, "chunk1.zip", Map(
      "s1.xml" -> doc("NCT001", "alpha", Seq("acme", "umbrella")),
      "s2.xml" -> doc("NCT002", "beta-amended", Seq("acme", "initech"))))
    writeZip(landing, "chunk3.zip", Map(
      "s4.xml" -> doc("NCT004", "delta", Seq("acme"))))
    val delta2 = ClinicalTrial.ingestIncrement(spark, params, runSeq = 2L)
    val deltaIds = delta2.select("nct_id").collect().map(_.getString(0)).sorted
    assert(deltaIds.toSeq == Seq("NCT002", "NCT004"))

    val snap = ClinicalTrial.snapshot(spark, params, delta2)
    assert(snap.count() == 4)
    val title2 = snap.filter(col("nct_id") === "NCT002")
      .select("title").collect().head.getString(0)
    assert(title2 == "beta-amended")

    // Re-run flatten + warehouse over the merged snapshot.
    ClinicalTrial.registerFlattenedViews(spark, snap,
      cascadeKeys = Seq(("nct_id", "pk_nct_id")))
    val counts2 = ClinicalTrial.loadWarehouse(spark, params, transformations)
    assert(counts2 == Map("studies" -> 4L, "sponsors" -> 5L))
  }

  test("readStaging sees a COMPRESSED staging area (not just *.json files)") {
    import spark.implicits._
    // A staging dir written with a codec holds part-*.json.gz — the old
    // ".json"-suffix probe read it as empty, so every later run re-ingested
    // the whole landing area as "new" and appended duplicates.
    val base = Files.createTempDirectory("ct_gz").toString
    val params = ClinicalTrial.Params(
      landingDir = s"$base/landing", stagingDir = s"$base/staging",
      warehouseDir = s"$base/wh",
      xmlSchema = StructType.fromDDL("nct_id STRING, title STRING"),
      pks = Seq("nct_id"))
    val like = Seq(("NCT001", "alpha")).toDF("nct_id", "title")
    like.write.option("compression", "gzip").json(params.stagingDir)
    val staged = ClinicalTrial.readStaging(spark, params, like)
    assert(staged.count() == 1L,
      "compressed staging files must be recognized as data")
  }
}
