package graft.tools
import org.apache.spark.sql.functions._
object PretrainAB {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local("pretrain-ab")
    def docs = graft.core.Tables.load(spark, dir, "documents")
    def a = graft.pipelines.PretrainCorpus.prepare(docs, "doc_id", "text")
    def b = graft.pipelines.PretrainCorpus.prepare(
      graft.core.Parallelize.fanOut(docs, 0L), "doc_id", "text")
    def time(fn: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }
    time(a); time(b)
    val (as, bs) = (1 to 5).map(_ => (time(a), time(b))).unzip
    println(f"A(plain)  min ${as.min}%.3f reps ${as.map(t => f"$t%.2f").mkString(" ")}")
    println(f"B(fanned) min ${bs.min}%.3f reps ${bs.map(t => f"$t%.2f").mkString(" ")}")
    spark.stop()
  }
}
