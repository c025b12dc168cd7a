package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output distribution policy applied before a write — controls file counts
  * and skew (reference: utils/spark.py:119-147, clinical_trial_etl.py:53-66).
  *
  * At 100 TB the policy choice is the difference between a healthy write and
  * a small-files explosion or a single hot partition:
  *  - `Coalesce` merges partitions without a shuffle (downsize only);
  *  - `ByColumns` hash-partitions on the given keys (co-locates rows that
  *    land in the same output partition / JDBC target);
  *  - `Salted` appends a random salt to otherwise-skewed keys so one huge
  *    key spreads over `saltBuckets` tasks (salt column is dropped after).
  */
sealed trait RepartitionPolicy
object RepartitionPolicy {
  case object Keep extends RepartitionPolicy
  final case class Coalesce(n: Int) extends RepartitionPolicy
  final case class ByColumns(cols: Seq[String], n: Option[Int] = None) extends RepartitionPolicy
  final case class ByRange(cols: Seq[String], n: Option[Int] = None) extends RepartitionPolicy
  final case class Salted(cols: Seq[String], saltBuckets: Int, n: Option[Int] = None)
      extends RepartitionPolicy

  def apply(df: DataFrame, policy: RepartitionPolicy): DataFrame = policy match {
    case Keep        => df
    case Coalesce(n) => df.coalesce(n)
    case ByColumns(cols, n) =>
      val cs: Seq[Column] = cols.map(col)
      n.fold(df.repartition(cs: _*))(df.repartition(_, cs: _*))
    case ByRange(cols, n) =>
      val cs: Seq[Column] = cols.map(col)
      n.fold(df.repartitionByRange(cs: _*))(df.repartitionByRange(_, cs: _*))
    case Salted(cols, buckets, n) =>
      // salted key ≙ reference's concat_ws('~', cols…, floor(rand()*n))
      // (utils/spark.py:142-147); salt dropped post-shuffle. The salt is
      // DETERMINISTIC per (partition, row position) — not rand(): a shuffle
      // key that changes when a lost map task recomputes sends rows to
      // different reducers than the surviving fetched outputs, silently
      // duplicating or dropping them. monotonically_increasing_id replays
      // identically for deterministic sources and still spreads a hot key
      // evenly within each partition.
      val saltCol = "__graft_salt"
      val salted = df.withColumn(
        saltCol, concat_ws("~",
          (cols.map(col) :+ pmod(monotonically_increasing_id(), lit(buckets.toLong))): _*))
      val out = n.fold(salted.repartition(col(saltCol)))(salted.repartition(_, col(saltCol)))
      out.drop(saltCol)
  }
}

/** Multi-format sink surface (reference sinks: SURVEY.md §2.1 S10-S13). */
object DataWriter {

  def write(df: DataFrame,
            fileType: FileType,
            location: String,
            mode: SaveMode = SaveMode.Overwrite,
            options: Map[String, String] = Map.empty,
            partitionBy: Seq[String] = Nil,
            policy: RepartitionPolicy = RepartitionPolicy.Keep): Unit = {
    val distributed = RepartitionPolicy(df, policy)
    val w0 = distributed.write.mode(mode).options(options)
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    fileType match {
      case FileType.Csv     => w.option("header", options.getOrElse("header", "true")).csv(location)
      case FileType.Json    => w.json(location)
      case FileType.Parquet => w.parquet(location)
      case FileType.Orc     => w.orc(location)
      case FileType.Xml     => w.format("xml").save(location)
      case FileType.Text    => w.text(location)
      case FileType.Table   => w.saveAsTable(location)
      case FileType.Binary  =>
        throw new IllegalArgumentException("binaryFile is a read-only source")
    }
  }

  /** JDBC sink with pre-write key repartitioning
    * (reference: clinical_trial_etl.py:53-66).
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                connProps: Map[String, String],
                mode: SaveMode = SaveMode.Overwrite,
                policy: RepartitionPolicy = RepartitionPolicy.Keep): Unit = {
    val opts = connProps + ("url" -> url, "dbtable" -> table)
    RepartitionPolicy(df, policy).write.mode(mode).format("jdbc").options(opts).save()
  }
}
