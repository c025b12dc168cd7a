package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Distributed ingestion fan-out (SURVEY.md §2.1 S9): a (small) list of
  * source URIs is parallelized and each partition of URIs is fetched **on
  * executors**, writing payloads straight to the destination filesystem —
  * the driver never sees a payload byte (reference:
  * clinical_trial_etl.py:128-140 `sc.parallelize(urls).foreach(download)`).
  *
  * The fetcher is injectable: production uses an HTTP/S3 client initialized
  * once per partition; tests use `file:` URIs. Shared job parameters travel
  * as a broadcast value exactly like the reference's `sc.broadcast(params)`
  * (clinical_trial_etl.py:85-90).
  */
object DistributedFetch {

  /** One fetch outcome (small — safe to collect for reporting). */
  final case class FetchResult(uri: String, dest: String, bytes: Long,
                               ok: Boolean, error: Option[String])

  /** Default fetcher: any java.net.URL-readable URI (file:, http:, ...). */
  def urlFetcher(uri: String): Array[Byte] = {
    val in = new java.net.URI(uri).toURL.openStream()
    try in.readAllBytes() finally in.close()
  }

  /** Destination filename per URI, computed driver-side over the FULL list
    * so collisions are visible: a unique non-empty basename is kept as-is;
    * a basename shared by several URIs (or empty — URI ending in '/') is
    * disambiguated with a short stable hash of the full URI, so distinct
    * sources can never silently overwrite each other in `destDir`. */
  def destNames(uris: Seq[String]): Map[String, String] = {
    def base(uri: String) = uri.substring(uri.lastIndexOf('/') + 1)
    val byName = uris.groupBy(base)
    uris.map { uri =>
      val name = base(uri)
      val unique = name.nonEmpty && byName(name).distinct.size == 1
      uri -> (if (unique) name
              else {
                val h = Integer.toHexString(
                  scala.util.hashing.MurmurHash3.stringHash(uri))
                if (name.isEmpty) s"uri-$h" else s"$h-$name"
              })
    }.toMap
  }

  /** Fetch every URI into `destDir/<name>` (names via [[destNames]] —
    * collision-safe), executor-side, with per-partition parallelism =
    * `parallelism` tasks. Returns per-URI outcomes (collected — result
    * rows are tiny) and counts successes via an accumulator so progress is
    * visible mid-job. */
  def fetchToDir(spark: SparkSession, uris: Seq[String], destDir: String,
                 fetcher: String => Array[Byte] = urlFetcher,
                 parallelism: Int = 8): Seq[FetchResult] = {
    import spark.implicits._
    val okCount: LongAccumulator = spark.sparkContext.longAccumulator("fetch_ok")
    val dest = spark.sparkContext.broadcast(destDir)
    val names = spark.sparkContext.broadcast(destNames(uris))
    // Writes go through the Hadoop FileSystem API with the SESSION's conf
    // (same pattern as ZipIngest.writeZipMembers): java.nio only reaches
    // the executor's local disk, so an hdfs:///s3a:// destDir became a
    // literal local directory name, payloads scattered across executor
    // working dirs, and the FetchResults still reported ok=true — data
    // loss disguised as success on any real cluster.
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val n = math.max(1, math.min(parallelism, uris.size))
    spark.createDataset(uris.distinct).repartition(n)
      .mapPartitions { it =>
        // per-partition client init would go here (amortized across URIs)
        val conf = serConf.value
        it.map { uri =>
          try {
            val bytes = fetcher(uri)
            val target =
              new org.apache.hadoop.fs.Path(dest.value, names.value(uri))
            val os = target.getFileSystem(conf).create(target, true)
            try os.write(bytes) finally os.close()
            okCount.add(1)
            FetchResult(uri, target.toString, bytes.length.toLong, ok = true, None)
          } catch {
            case e: Exception =>
              FetchResult(uri, "", 0L, ok = false, Some(e.toString))
          }
        }
      }
      .collect().toSeq
  }
}
