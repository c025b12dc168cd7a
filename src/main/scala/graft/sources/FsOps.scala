package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem object operations through the Hadoop FS API (SURVEY.md §2.1
  * S16): the reference's boto3 bucket/dir/file helpers
  * (reference: utils/Utilities.py:47-148) become scheme-agnostic calls —
  * the same code path serves local fs in tests and s3a/hdfs/abfs in
  * production, because `FileSystem.get(uri, conf)` resolves the connector
  * from the path scheme. Not an engine operator; operational surface.
  */
object FsOps {

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    val conf: Configuration = spark.sparkContext.hadoopConfiguration
    (p.getFileSystem(conf), p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path); f.exists(p)
  }

  def mkdirs(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path); f.mkdirs(p)
  }

  def delete(spark: SparkSession, path: String, recursive: Boolean = true): Boolean = {
    val (f, p) = fs(spark, path); f.delete(p, recursive)
  }

  /** Rename within one filesystem (HDFS/local: atomic metadata op; object
    * stores emulate it with copy+delete — callers doing swap protocols
    * should prefer a real table format there). */
  def rename(spark: SparkSession, from: String, to: String): Boolean = {
    val (f, p1) = fs(spark, from); f.rename(p1, new Path(to))
  }

  /** Non-recursive listing of immediate children (name, isDir, size). */
  def list(spark: SparkSession, path: String): Seq[(String, Boolean, Long)] = {
    val (f, p) = fs(spark, path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(s =>
      (s.getPath.toString, s.isDirectory, s.getLen))
  }

  /** Write a small string object (reference: put_string / upload). */
  def putString(spark: SparkSession, path: String, content: String): Unit = {
    val (f, p) = fs(spark, path)
    val out = f.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  def readString(spark: SparkSession, path: String): String = {
    val (f, p) = fs(spark, path)
    val in = f.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  def copy(spark: SparkSession, from: String, to: String): Unit = {
    val (f1, p1) = fs(spark, from)
    val (f2, p2) = fs(spark, to)
    org.apache.hadoop.fs.FileUtil.copy(f1, p1, f2, p2, false, true,
      spark.sparkContext.hadoopConfiguration)
  }
}
