package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec

class ZipIngestSpec extends SparkSpec {

  private def makeZip(dir: java.nio.file.Path, name: String,
                      members: Map[String, String]): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(dir.resolve(name).toFile))
    members.foreach { case (n, content) =>
      zos.putNextEntry(new ZipEntry(n))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
  }

  test("readZipMembers extracts filtered members executor-side") {
    val dir = Files.createTempDirectory("graft_zip")
    makeZip(dir, "a.zip", Map(
      "one.xml" -> "<r>1</r>", "two.txt" -> "nope", "three.xml" -> "<r>3</r>"))
    makeZip(dir, "b.zip", Map("four.xml" -> "<r>4</r>"))

    val all = ZipIngest.readZipMembers(spark, dir.toString).collect()
    assert(all.length == 4)
    // sizeBytes must come from the materialized content: the zip header's
    // getSize is -1 for streaming (data-descriptor) archives.
    assert(all.forall(m => m.sizeBytes == m.content.length.toLong),
      s"sizeBytes must match content: ${all.map(m => m.member -> m.sizeBytes).toSeq}")

    val xml = ZipIngest.readZipMembers(spark, dir.toString,
      ZipIngest.NameFilter(suffix = Some(".xml"))).collect()
    assert(xml.map(_.member).sorted.toSeq == Seq("four.xml", "one.xml", "three.xml"))
    assert(new String(xml.find(_.member == "one.xml").get.content, "UTF-8") == "<r>1</r>")

    val names = ZipIngest.listZipMembers(spark, dir.toString).collect()
    assert(names.length == 4)

    val lines = ZipIngest.readZipText(spark, dir.toString,
      ZipIngest.NameFilter(contains = Some("two"))).collect()
    assert(lines.map(_.getString(2)).toSeq == Seq("nope"))
  }
}

class DistributedFetchSpec extends SparkSpec {

  test("fetchToDir pulls file: URIs onto executors and reports outcomes") {
    val srcDir = Files.createTempDirectory("graft_fetch_src")
    val destDir = Files.createTempDirectory("graft_fetch_dst")
    (1 to 3).foreach(i =>
      Files.writeString(srcDir.resolve(s"chunk$i.xml"), s"<doc>$i</doc>"))
    val uris = (1 to 3).map(i => srcDir.resolve(s"chunk$i.xml").toUri.toString) :+
      (srcDir.resolve("missing.xml").toUri.toString)

    val results = DistributedFetch.fetchToDir(spark, uris, destDir.toString)
    assert(results.count(_.ok) == 3)
    assert(results.count(!_.ok) == 1)
    assert(Files.readString(destDir.resolve("chunk2.xml")) == "<doc>2</doc>")
  }

  test("destNames disambiguates colliding basenames and empty names") {
    val uris = Seq(
      "http://a.example/data/part.xml",
      "http://b.example/data/part.xml",
      "http://c.example/data/unique.xml",
      "http://d.example/dir/")
    val names = DistributedFetch.destNames(uris)
    assert(names("http://c.example/data/unique.xml") == "unique.xml")
    // colliding basenames get distinct hash-prefixed names
    val collided = Seq(names(uris(0)), names(uris(1)))
    assert(collided.distinct.size == 2)
    assert(collided.forall(_.endsWith("-part.xml")))
    // trailing-slash URI yields a non-empty synthesized name
    assert(names(uris(3)).startsWith("uri-") && names(uris(3)).length > 4)
  }

  test("fetchToDir keeps both payloads when basenames collide") {
    val srcA = Files.createTempDirectory("graft_fetch_a")
    val srcB = Files.createTempDirectory("graft_fetch_b")
    val destDir = Files.createTempDirectory("graft_fetch_coll")
    Files.writeString(srcA.resolve("same.xml"), "<doc>A</doc>")
    Files.writeString(srcB.resolve("same.xml"), "<doc>B</doc>")
    val uris = Seq(srcA.resolve("same.xml").toUri.toString,
      srcB.resolve("same.xml").toUri.toString)
    val results = DistributedFetch.fetchToDir(spark, uris, destDir.toString)
    assert(results.forall(_.ok))
    val written = results.map(r => Files.readString(
      java.nio.file.Paths.get(r.dest))).sorted
    assert(written == Seq("<doc>A</doc>", "<doc>B</doc>"))
    assert(results.map(_.dest).distinct.size == 2)
  }
}

class FsOpsSpec extends SparkSpec {

  test("FsOps covers mkdirs/put/read/list/copy/delete on the local scheme") {
    val base = Files.createTempDirectory("graft_fs").toString
    assert(FsOps.mkdirs(spark, s"$base/sub"))
    FsOps.putString(spark, s"$base/sub/x.txt", "hello")
    assert(FsOps.exists(spark, s"$base/sub/x.txt"))
    assert(FsOps.readString(spark, s"$base/sub/x.txt") == "hello")
    FsOps.copy(spark, s"$base/sub/x.txt", s"$base/sub/y.txt")
    val names = FsOps.list(spark, s"$base/sub").map(_._1)
    assert(names.exists(_.endsWith("x.txt")) && names.exists(_.endsWith("y.txt")))
    assert(FsOps.delete(spark, s"$base/sub"))
    assert(!FsOps.exists(spark, s"$base/sub"))
  }
}
