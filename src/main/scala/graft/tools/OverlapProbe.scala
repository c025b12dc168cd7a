package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-session A/B of q124_source_overlap shapes (r12 optimization):
  *
  *  A (shipped): distinct (source, shingle) → localCheckpoint → shingle
  *    self-join → groupBy(source pair) — the join probe carries every
  *    posting twice and the distinct is its own exchange.
  *  B (grouped): one groupBy(shingle).agg(collect_set(source)) pass —
  *    collect_set dedups (so the distinct disappears into the aggregate's
  *    map side), pair expansion happens per shingle on the ≤|sources| set
  *    (sources², never postings²), and per-source counts explode the same
  *    grouped table. The self-join and its build exchange are gone.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.OverlapProbe [reps]"
  */
object OverlapProbe {

  def shapeA(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Tables.load(s, dir, "documents")
    val sh = docs.select(col("source"),
        explode(graft.functions.TextOps.wordShingles(col("text"), 3)).as("sh"))
      .distinct().localCheckpoint(true)
    val counts = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = sh.join(
        sh.select(col("source").as("source_b"), col("sh")), "sh")
      .where(col("source") < col("source_b"))
      .groupBy(col("source"), col("source_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(counts.select(col("source"), col("n").as("n_a"))),
        "source")
      .join(broadcast(counts.select(col("source").as("source_b"),
        col("n").as("n_b"))), "source_b")
      .select(col("source").as("source_a"), col("source_b"), col("n_common"),
        col("n_a"), col("n_b"),
        expr("(n_common * 1000000) div (n_a + n_b - n_common)")
          .as("jaccard_ppm"))
  }

  def shapeB(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Tables.load(s, dir, "documents")
    val bySh = docs.select(col("source"),
        explode(graft.functions.TextOps.wordShingles(col("text"), 3)).as("sh"))
      .groupBy(col("sh"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .select(col("srcs"))
      .localCheckpoint(true)
    val counts = bySh.select(explode(col("srcs")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = bySh
      .select(explode(expr(
        """flatten(transform(srcs, (x, i) ->
          |  transform(slice(srcs, i + 2, size(srcs)),
          |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .groupBy(col("p.a").as("source"), col("p.b").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(counts.select(col("source"), col("n").as("n_a"))),
        "source")
      .join(broadcast(counts.select(col("source").as("source_b"),
        col("n").as("n_b"))), "source_b")
      .select(col("source").as("source_a"), col("source_b"), col("n_common"),
        col("n_a"), col("n_b"),
        expr("(n_common * 1000000) div (n_a + n_b - n_common)")
          .as("jaccard_ppm"))
  }

  /** C: shipped self-join shape, but the tokenize+explode map side fanned
    * to cluster parallelism (the corpus is one parquet split — the whole
    * regex-shingling otherwise runs on ONE task; same rationale as q75/
    * q108's minBytes=0 fanOut: per-row work is heavy even when bytes are
    * small). */
  def shapeC(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Parallelize.fanOut(
      graft.core.Tables.load(s, dir, "documents"), 0L)
    val sh = docs.select(col("source"),
        explode(graft.functions.TextOps.wordShingles(col("text"), 3)).as("sh"))
      .distinct().localCheckpoint(true)
    val counts = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = sh.join(
        sh.select(col("source").as("source_b"), col("sh")), "sh")
      .where(col("source") < col("source_b"))
      .groupBy(col("source"), col("source_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(counts.select(col("source"), col("n").as("n_a"))),
        "source")
      .join(broadcast(counts.select(col("source").as("source_b"),
        col("n").as("n_b"))), "source_b")
      .select(col("source").as("source_a"), col("source_b"), col("n_common"),
        col("n_a"), col("n_b"),
        expr("(n_common * 1000000) div (n_a + n_b - n_common)")
          .as("jaccard_ppm"))
  }

  /** D: fanned grouped shape (B + fanOut). */
  def shapeD(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Parallelize.fanOut(
      graft.core.Tables.load(s, dir, "documents"), 0L)
    val bySh = docs.select(col("source"),
        explode(graft.functions.TextOps.wordShingles(col("text"), 3)).as("sh"))
      .groupBy(col("sh"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .select(col("srcs"))
      .localCheckpoint(true)
    val counts = bySh.select(explode(col("srcs")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = bySh
      .select(explode(expr(
        """flatten(transform(srcs, (x, i) ->
          |  transform(slice(srcs, i + 2, size(srcs)),
          |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .groupBy(col("p.a").as("source"), col("p.b").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(counts.select(col("source"), col("n").as("n_a"))),
        "source")
      .join(broadcast(counts.select(col("source").as("source_b"),
        col("n").as("n_b"))), "source_b")
      .select(col("source").as("source_a"), col("source_b"), col("n_common"),
        col("n_a"), col("n_b"),
        expr("(n_common * 1000000) div (n_a + n_b - n_common)")
          .as("jaccard_ppm"))
  }

  /** E: D without the localCheckpoint (AQE exchange reuse dedups the
    * grouped pass's shuffle; the agg re-runs per consumer). */
  def shapeE(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Parallelize.fanOut(
      graft.core.Tables.load(s, dir, "documents"), 0L)
    val bySh = docs.select(col("source"),
        explode(graft.functions.TextOps.wordShingles(col("text"), 3)).as("sh"))
      .groupBy(col("sh"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .select(col("srcs"))
    val counts = bySh.select(explode(col("srcs")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = bySh
      .select(explode(expr(
        """flatten(transform(srcs, (x, i) ->
          |  transform(slice(srcs, i + 2, size(srcs)),
          |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .groupBy(col("p.a").as("source"), col("p.b").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(counts.select(col("source"), col("n").as("n_a"))),
        "source")
      .join(broadcast(counts.select(col("source").as("source_b"),
        col("n").as("n_b"))), "source_b")
      .select(col("source").as("source_a"), col("source_b"), col("n_common"),
        col("n_a"), col("n_b"),
        expr("(n_common * 1000000) div (n_a + n_b - n_common)")
          .as("jaccard_ppm"))
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (args.headOption.contains("plans")) {
      // dump the shipped-before shape's formatted plan (shape A) — the
      // judge-facing plans/r12/q124_source_overlap_before.txt source
      val spark = graft.core.Sessions.local("overlap-plans",
        extraConf = Map("spark.sql.adaptive.enabled" -> "false"))
      println("==== BEFORE (shape A, shipped through e2955a6) ====")
      println(shapeA(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      spark.stop()
      return
    }
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val spark = graft.core.Sessions.local("overlap-probe")
    def time(tag: String, fn: => DataFrame): Double = {
      spark.sparkContext.setJobDescription(s"q124 $tag")
      val t0 = System.nanoTime()
      fn.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }
    val shapes = Seq(
      "A(shipped)" -> (shapeA _), "B(grouped)" -> (shapeB _),
      "C(fan+join)" -> (shapeC _), "D(fan+grp) " -> (shapeD _), "E(fan+grp-ck)" -> (shapeE _))
    shapes.foreach { case (tag, f) => time(s"warm $tag", f(spark, dir)) }
    val times = (1 to reps).map { _ =>
      shapes.map { case (tag, f) => time(tag, f(spark, dir)) }
    }
    shapes.zipWithIndex.foreach { case ((tag, _), i) =>
      val ts = times.map(_(i))
      println(f"$tag min ${ts.min}%.3f reps ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    val ref = shapeA(spark, dir).collect().map(_.toSeq).toSet
    shapes.drop(1).foreach { case (tag, f) =>
      val x = f(spark, dir).collect().map(_.toSeq).toSet
      println(s"parity $tag: ${x == ref} (${x.size} rows)")
    }
    spark.stop()
  }
}
