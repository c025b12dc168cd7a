package graft.pipelines

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PretrainCorpusSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    val varied = (1 to 45).map(i => s"word$i").mkString(" ") // 45 distinct tokens
    Seq(
      (1L, varied),                                          // ok
      (2L, varied),                                          // exact dup of 1
      (3L, "too short"),                                     // length gate
      (4L, ("spam " * 40).trim),                             // repetition gate
      (5L, "a completely different document about spark partitions " +
        "and shuffle boundaries at considerable scale with no " +
        "repeated phrasing anywhere in its body at all")     // ok
    ).toDF("doc_id", "text")
  }

  test("survivors applies length, repetition, and dedup gates in order") {
    val cfg = PretrainCorpus.Config(minChars = 40, maxRepPpm = 500000)
    val got = rows(PretrainCorpus.survivors(docs, "doc_id", "text", cfg))
      .map(_.getAs[Long]("id")).sorted
    // 3 fails length; 4 fails repetition ("spam spam" everywhere);
    // 2 loses exact dedup to 1; 1 and 5 survive
    assert(got == Seq(1L, 5L))
  }

  test("prepare chunks the surviving corpus deterministically") {
    val cfg = PretrainCorpus.Config(minChars = 40, maxRepPpm = 500000,
      chunkSize = 16, chunkOverlap = 4)
    val chunks = PretrainCorpus.prepare(docs, "doc_id", "text", cfg)
    val a = rows(chunks.orderBy(col("id"), col("chunk_idx")))
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("chunk_idx"),
        r.getAs[String]("chunk_text")))
    // doc 1 has 45 tokens → ceil((45-4)/12) = 4 chunks
    assert(a.count(_._1 == 1L) == 4)
    // re-running the pipeline yields the identical result (determinism)
    val b = rows(PretrainCorpus.prepare(docs, "doc_id", "text", cfg)
      .orderBy(col("id"), col("chunk_idx")))
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("chunk_idx"),
        r.getAs[String]("chunk_text")))
    assert(a == b)
  }
}
