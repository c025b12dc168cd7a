package graft.text

import graft.SparkSpec

class PackChunksSpec extends SparkSpec {
  import spark.implicits._

  test("packChunks cuts the concatenated stream at the token budget") {
    // tokens: 3, 4, 2, 5 — budget 6: starts 0,3,7,9 → chunks 0,0,1,1
    val docs = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h i"),
      (4L, "j k l m n")).map { case (i, t) => ("s", i, t) }
      .toDF("src", "id", "text")
    val got = Corpus.packChunks(docs, "src", "id", "text", budget = 6L)
      .orderBy("chunk_id")
      .select("chunk_id", "n_docs", "n_tokens", "first_doc", "last_doc")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 7L, 1L, 2L), (1L, 2L, 7L, 3L, 4L)))
  }

  test("packChunks rejects a non-positive budget instead of NULL-collapsing") {
    val docs = Seq(("s", 1L, "a b")).toDF("src", "id", "text")
    val e = intercept[IllegalArgumentException] {
      Corpus.packChunks(docs, "src", "id", "text", budget = 0L)
    }
    assert(e.getMessage.contains("positive token budget"))
  }

  test("packChunks is deterministic under duplicate (stream, id) rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two docs share id 10 with different token counts: the cumsum order
    // is pinned by (id, n_tok), so the chunk stats are reproducible
    // (pre-fix they depended on shuffle order)
    val docs = Seq(
      (1, 10, "a b c"),            // 3 tokens
      (1, 10, "a b c d e f g"),    // 7 tokens — ordered AFTER the 3-token twin
      (1, 11, "x y z")             // starts at 10, lands in chunk 1
    ).toDF("src", "id", "text")
    val expected = (0 until 5).map { i =>
      graft.text.Corpus.packChunks(docs.repartition(i + 2), "src", "id", "text",
          budget = 8L)
        .orderBy("chunk_id")
        .select(col("chunk_id"), col("n_docs"), col("n_tokens"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    assert(expected.distinct.size == 1, s"nondeterministic chunks: $expected")
    assert(expected.head == Seq((0L, 2L, 10L), (1L, 1L, 3L)))
  }

  test("packChunks streams are independent (per-source chunk ids)") {
    val docs = Seq(("a", 1L, "x y z"), ("b", 2L, "x y z"))
      .toDF("src", "id", "text")
    val got = Corpus.packChunks(docs, "src", "id", "text", budget = 2L)
      .select("src", "chunk_id").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 0L), ("b", 0L)))
  }
}
