package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** r12 A/B for the termFrequencies exchange placement (q60/q91/q76):
  *
  *  A (shipped): explode → exchange by (id, term) for the tf agg, then a
  *    SECOND exchange by id for the per-doc window / per-doc agg.
  *  B (id-keyed): repartition the DOCUMENTS by id BEFORE the explode —
  *    hash(id) satisfies the (id, term) clustering, so the tf agg, the
  *    per-doc aggregates AND the per-doc top-k window all reuse that one
  *    exchange, and the exchange carries each document's text once
  *    instead of posting-level rows (guide §2.3/§2.4).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.CorpusProbe [reps]"
  */
object CorpusProbe {

  private def tfB(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.repartition(col(idCol))
      .select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  def topTermsB(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    val tf = tfB(docs, idCol, textCol)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"), col("tf"), col("df"),
        round(col("tf").cast("double") *
          log((col("n_docs") + 1).cast("double") / (col("df") + 1).cast("double")),
          6).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val spark = graft.core.Sessions.local("corpus-probe")
    def docs = graft.core.Tables.load(spark, dir, "documents")
    def shapeA = graft.text.Corpus.topTerms(docs, "doc_id", "text", 3)
    def shapeB = topTermsB(docs, "doc_id", "text", 3)
    def time(tag: String, fn: => DataFrame): Double = {
      spark.sparkContext.setJobDescription(s"corpus $tag")
      val t0 = System.nanoTime()
      fn.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time("warmA", shapeA); time("warmB", shapeB)
    val (as, bs) = (1 to reps).map { _ =>
      (time("A", shapeA), time("B", shapeB))
    }.unzip
    println(f"A(shipped)  min ${as.min}%.3f reps ${as.map(t => f"$t%.2f").mkString(" ")}")
    println(f"B(id-keyed) min ${bs.min}%.3f reps ${bs.map(t => f"$t%.2f").mkString(" ")}")
    val a = shapeA.collect().map(_.toSeq).toSet
    val b = shapeB.collect().map(_.toSeq).toSet
    println(s"parity: ${a == b} (A ${a.size} rows, B ${b.size} rows)")
    spark.stop()
  }
}
