package graft.text

import graft.SparkSpec

class CorpusSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry cherry"),
      (3L, "apple unique")
    ).toDF("doc_id", "text")
  }

  test("oovRate: tokens outside the top-k vocabulary count as OOV, ppm half-up") {
    val got = rows(Corpus.oovRate(docs, "doc_id", "text", vocabSize = 3))
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"), r.getAs[Long]("oov_ppm")))
      .toMap
    // corpus counts: apple 3, banana 2, cherry 3, unique 1 → vocab(3) by
    // (count desc, term asc) = {apple, cherry, banana}; only "unique" is OOV
    assert(got(1L) == ((4L, 0L, 0L)))
    assert(got(2L) == ((3L, 0L, 0L)))
    assert(got(3L) == ((2L, 1L, 500000L)))
  }

  test("ngramRepetition: repeated 2-grams raise the duplicate fraction") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b a b a b"),       // grams: ab ba ab ba ab → 5 grams, 2 distinct
      (2L, "w x y z"),           // 3 grams, all distinct
      (3L, "solo")               // < 2 tokens → filtered out
    ).toDF("doc_id", "text")
    val got = rows(Corpus.ngramRepetition(d, "doc_id", "text", 2))
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_distinct"), r.getAs[Long]("rep_ppm")))
      .toMap
    assert(got(1L) == ((5L, 2L, 600000L)))
    assert(got(2L) == ((3L, 3L, 0L)))
    assert(!got.contains(3L))
  }

  test("charEntropy: uniform chars maximize entropy, constant chars zero it") {
    import spark.implicits._
    val d = Seq((1L, "aaaa"), (2L, "abcd")).toDF("doc_id", "text")
    val got = rows(Corpus.charEntropy(d, "doc_id", "text"))
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_chars"), r.getAs[Double]("entropy"))).toMap
    assert(got(1L) == ((4L, 0.0)))
    // 4 distinct chars, p=1/4 each → H = ln(4) ≈ 1.386294 µnat-rounded
    assert(got(2L)._1 == 4L && math.abs(got(2L)._2 - math.log(4.0)) < 1e-5)
  }

  test("tfidf computes tf, df and the smoothed-log weight") {
    val got = rows(Corpus.tfidf(docs, "doc_id", "text"))
      .map(r => ((r.getAs[Long]("id"), r.getAs[String]("term")),
        (r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("tfidf"))))
      .toMap
    // apple: doc1 tf=2, appears in docs {1,3} → df=2
    assert(got((1L, "apple"))._1 == 2L && got((1L, "apple"))._2 == 2L)
    // unique: df=1 → weight ln(4/2) * 1
    assert(math.abs(got((3L, "unique"))._3 - math.log(2.0)) < 1e-5)
    // cherry in doc2: tf=2, df=2
    assert(got((2L, "cherry")) == ((2L, 2L,
      BigDecimal(2 * math.log(4.0 / 3.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("topTerms ranks integer-deterministically (tf desc, df asc, term asc)") {
    val got = rows(Corpus.topTerms(docs, "doc_id", "text", 2))
      .filter(_.getAs[Long]("id") == 1L)
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[String]("term"), r.getAs[Int]("rank")))
    // doc1: apple tf=2 first; banana vs cherry both tf=1 df=2 → term asc
    assert(got == Seq(("apple", 1), ("banana", 2)))
  }

  test("unigramSurprisal: rare-token docs score higher than common-token docs") {
    val got = rows(Corpus.unigramSurprisal(docs, "doc_id", "text"))
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_doc_tokens"), r.getAs[Double]("mean_surprisal"))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L)._1 == 4L)
    // doc 3 contains 'unique' (corpus-count 1) → highest mean surprisal
    assert(got(3L)._2 > got(1L)._2 && got(3L)._2 > got(2L)._2)
    // hand-check doc 3: corpus = 9 tokens; apple ctf 3/9, unique ctf 1/9
    val expected = -(math.floor(math.log(3.0 / 9) * 1e9 + 0.5) +
      math.floor(math.log(1.0 / 9) * 1e9 + 0.5))
    val mean6 = ((2 * expected.toLong + 2 * 1000) / (2 * 2 * 1000)).toDouble / 1e6
    assert(math.abs(got(3L)._2 - mean6) < 1e-12)
  }

  test("chunk emits overlapping fixed-size windows, last chunk trimmed") {
    import spark.implicits._
    val doc = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = rows(Corpus.chunk(doc, "doc_id", "text", size = 5, overlap = 2))
      .sortBy(_.getAs[Long]("chunk_idx"))
      .map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("n_chunk_tokens"),
        r.getAs[String]("chunk_text")))
    // n=10, size=5, step=3 → chunks at 0,3,6: [t1..t5], [t4..t8], [t7..t10]
    assert(got == Seq(
      (0L, 5L, "t1 t2 t3 t4 t5"),
      (1L, 5L, "t4 t5 t6 t7 t8"),
      (2L, 4L, "t7 t8 t9 t10")))
  }

  test("chunk: short docs yield one chunk; empty docs none") {
    import spark.implicits._
    val d = Seq((1L, "a b"), (2L, "   ")).toDF("doc_id", "text")
    val got = rows(Corpus.chunk(d, "doc_id", "text", size = 5, overlap = 2))
    assert(got.map(_.getAs[Long]("id")) == Seq(1L))
    assert(got.head.getAs[String]("chunk_text") == "a b")
  }
}
