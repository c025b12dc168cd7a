package graft.tools

import org.apache.spark.sql.DataFrame

/** r13 A/B closing the r12 verdict's q60/q76/q91 question: the id-keyed
  * tf exchange (documents repartitioned by id pre-explode) vs the r11
  * fanOut shape, on all three consumer pipelines, same-session alternating
  * via the [[graft.core.Gates.CorpusTfSmallInputMaxBytes]] gate (0 =
  * id-keyed, huge = fanOut). Run at sf0.1 AND at the 10× stress corpus to
  * settle the scale crossover. Parity asserted once per pipeline. */
object CorpusProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val spark = graft.core.Sessions.local("corpus-probe2")
    def docs = graft.core.Tables.load(spark, dir, "documents")
    val pipelines: Seq[(String, () => DataFrame)] = Seq(
      "q60_topTerms" -> (() => graft.text.Corpus.topTerms(docs, "doc_id", "text", 3)),
      "q76_surprisal" -> (() => graft.text.Corpus.unigramSurprisal(docs, "doc_id", "text")),
      "q91_bm25" -> (() => graft.text.Corpus.bm25TopTerms(docs, "doc_id", "text", 3)))
    val shapes = Seq("idKeyed" -> "0", "fanOut" -> Long.MaxValue.toString)

    def time(tag: String, fn: () => DataFrame): Double = {
      spark.sparkContext.setJobDescription(s"corpus2 $tag")
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both shapes
    for ((_, g) <- shapes; (n, fn) <- pipelines) {
      spark.conf.set(graft.core.Gates.CorpusTfSmallInputMaxBytes, g)
      time(s"warm $n", fn)
    }
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
      .withDefaultValue(Nil)
    for (r <- 1 to reps; (sn, g) <- shapes; (n, fn) <- pipelines) {
      spark.conf.set(graft.core.Gates.CorpusTfSmallInputMaxBytes, g)
      val dt = time(s"$n $sn rep$r", fn)
      acc((n, sn)) = acc((n, sn)) :+ dt
      System.err.println(f"[corpus2] $n $sn rep$r $dt%.2fs")
    }
    pipelines.foreach { case (n, fn) =>
      val a = acc((n, "idKeyed")); val b = acc((n, "fanOut"))
      spark.conf.set(graft.core.Gates.CorpusTfSmallInputMaxBytes, "0")
      val ra = fn().collect().map(_.toSeq).toSet
      spark.conf.set(graft.core.Gates.CorpusTfSmallInputMaxBytes, Long.MaxValue.toString)
      val rb = fn().collect().map(_.toSeq).toSet
      println(f"$n idKeyed=${a.min}%.2f (${a.map(t => f"$t%.2f").mkString(",")}) " +
        f"fanOut=${b.min}%.2f (${b.map(t => f"$t%.2f").mkString(",")}) " +
        s"parity=${ra == rb}")
    }
    spark.stop()
    sys.exit(0)
  }
}
