package graft.testing

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.{ColumnOps, IsoDuration, TextOps}
import graft.mapper.Flattener
import graft.sources.Standardize

/** Property-based suites over the seeded generators (the reference's
  * MockupData scaffold, finished — SURVEY.md §5 implication (d)).
  *
  * ScalaCheck `Gen`s are sampled with explicit seeds (the scalatest-plus
  * bridge isn't in the offline cache), so every failure reproduces from the
  * printed seed; DataFrame properties run over a handful of seeded schemas
  * to keep Spark job count bounded. */
class PropertySpec extends SparkSpec {

  /** Deterministic sample stream of `g`. */
  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("ISO duration format/parse roundtrips for any non-negative micros") {
    samples(Gen.chooseNum(0L, 400L * 86400 * 1000000), 200, seed = 7L)
      .foreach { micros =>
        assert(IsoDuration.parseMicros(IsoDuration.format(micros)) == micros,
          s"roundtrip failed for $micros")
      }
  }

  test("tryParseMicros never throws on arbitrary strings") {
    samples(Gen.asciiPrintableStr, 200, seed = 11L).foreach { s =>
      IsoDuration.tryParseMicros(s) // must not throw
    }
  }

  test("snakeCase is idempotent, lowercase, and space/dash-free") {
    samples(Gen.asciiPrintableStr, 200, seed = 13L).foreach { s =>
      val once = Standardize.snakeCase(s)
      assert(Standardize.snakeCase(once) == once, s"not idempotent on ${s.take(30)}")
      assert(once == once.toLowerCase, s"uppercase survived in '$once'")
      assert(!once.exists(c => c == ' ' || c == '-' || c == '\t'),
        s"space/dash survived in '$once'")
    }
  }

  test("wordShingles emits size-3 windows over generated token sequences") {
    import spark.implicits._
    val textGen = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dddd")).map(_.mkString(" "))
    val ts = samples(textGen, 40, seed = 17L)
    val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = df.select(col("id"), TextOps.wordShingles(col("t"), 3).as("sh"),
      size(TextOps.tokens(col("t"))).as("n")).collect()
    got.foreach { r =>
      val n = r.getAs[Int]("n")
      val sh = r.getSeq[String](1)
      assert(sh.forall(_.split(" ").length == 3), s"non-3-gram in $sh")
      assert(if (n < 3) sh.isEmpty else sh.length <= n - 2, s"count bound: n=$n got ${sh.length}")
    }
  }

  test("contentHash distinguishes null placement") {
    import spark.implicits._
    val df = Seq(
      (Option("a"), Option.empty[String], Option("b")),
      (Option("a"), Option("b"), Option.empty[String])
    ).toDF("x", "y", "z")
    val hashes = df.select(
      ColumnOps.contentHash(col("x"), col("y"), col("z")).as("h")).collect()
    assert(hashes(0).getString(0) != hashes(1).getString(0))
  }

  test("flattener reproduces row counts over seeded nested data") {
    (1L to 4L).foreach { seed =>
      val rnd = new Random(seed)
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("arr", ArrayType(StructType(Seq(
          StructField("a", IntegerType), StructField("b", StringType))))),
        StructField("st", StructType(Seq(
          StructField("u", StringType), StructField("v", DoubleType))))))
      val n = 20 + rnd.nextInt(30)
      val df = MockData.genDataFrame(spark, seed, schema, n,
        MockData.GenConfig(pNull = 0.2))
      val result = Flattener.flatten(df, "root")
      assert(result.views("root").count() == n, s"seed=$seed root count")
      val elems = df.select(explode(col("arr"))).count()
      assert(result.views("root_arr").count() == elems, s"seed=$seed arr count")
      assert(result.xpaths.contains("/root/arr"))
    }
  }

  test("chunking is a covering: non-overlap segments reconstruct every document") {
    import spark.implicits._
    val texts = samples(Gen.chooseNum(1, 40), 30, seed = 21L).zipWithIndex.map {
      case (n, i) => (i.toLong, (1 to n).map(k => s"w$k").mkString(" "))
    }
    val docs = texts.toDF("doc_id", "text")
    val step = 5 - 2 // size 5, overlap 2
    val rebuilt = graft.text.Corpus.chunk(docs, "doc_id", "text", 5, 2)
      .collect().groupBy(_.getAs[Long]("id")).map { case (id, rows) =>
        val ordered = rows.sortBy(_.getAs[Long]("chunk_idx"))
        // take the first `step` tokens of every chunk, all of the last
        val toks = ordered.zipWithIndex.flatMap { case (r, i) =>
          val ts = r.getAs[String]("chunk_text").split(" ").toSeq
          if (i == ordered.length - 1) ts else ts.take(step)
        }
        id -> toks.mkString(" ")
      }
    texts.foreach { case (id, text) =>
      assert(rebuilt(id) == text, s"doc $id not reconstructed")
    }
  }

  test("z-order interleave is injective within the bit budget") {
    import spark.implicits._
    val pts = samples(Gen.zip(Gen.chooseNum(0L, 255L), Gen.chooseNum(0L, 255L)),
      300, seed = 33L).distinct
    val zs = pts.toDF("x", "y")
      .select(graft.functions.ZOrder.interleave2(col("x"), col("y"), 8).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.distinct.length == pts.length, "collision in Morton keys")
    assert(zs.forall(z => z >= 0 && z < (1L << 16)))
  }

  test("sessionize invariants: sessions partition events, spans bounded by gaps") {
    import spark.implicits._
    val gapSec = 60L
    val events = samples(Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 3000L)),
      200, seed = 55L).zipWithIndex.map { case ((u, sec), i) =>
      (u, new java.sql.Timestamp(sec * 1000L), i.toLong)
    }.toDF("user_id", "ts", "event_id")
    val n = events.count()
    val sessions = graft.operators.Sessionize.sessionStats(
      events, "user_id", "ts", "event_id", gapSec, lit(1.0))
      .collect()
    // every event lands in exactly one session
    assert(sessions.map(_.getAs[Long]("n_events")).sum == n)
    // within a session, consecutive gaps <= gapSec ⇒ span <= (n-1)*gap
    sessions.foreach { s =>
      val span = s.getAs[Long]("span_us")
      val k = s.getAs[Long]("n_events")
      assert(span <= (k - 1) * gapSec * 1000000L,
        s"session span $span exceeds ${(k - 1)} gaps")
    }
  }

  test("genValue honors NESTED nullability: non-nullable slots never draw null") {
    // Spark codegen trusts declared nullability — a null in a
    // nullable=false nested slot makes the operator under test read
    // garbage, so the fuzzer would report phantom bugs. Drive a high
    // null probability through every nesting shape and assert the
    // non-nullable slots stay populated.
    val cfg = MockData.GenConfig(pNull = 0.9)
    val rnd = new Random(17L)
    val st = StructType(Seq(
      StructField("req", LongType, nullable = false),
      StructField("opt", LongType, nullable = true)))
    // genValue may return the WHOLE value as null (that is the top-level
    // draw genDataFrame guards with the field's own nullability) — the
    // nested contract is about the slots INSIDE a non-null value.
    val structs = (0 until 400).map(_ => MockData.genValue(rnd, st, cfg))
      .collect { case r: org.apache.spark.sql.Row => r }
    assert(structs.nonEmpty)
    structs.foreach(r => assert(!r.isNullAt(0), "non-nullable struct field drew null"))
    // and the nullable slot does exercise nulls at this probability
    assert(structs.exists(_.isNullAt(1)), "nullable field never drew null at pNull=0.9")
    val arrays = (0 until 400).map(_ => MockData.genValue(rnd,
        ArrayType(LongType, containsNull = false), cfg))
      .collect { case a: Seq[_] => a }
    assert(arrays.nonEmpty)
    arrays.foreach(a =>
      assert(a.forall(_ != null), "containsNull=false array drew a null element"))
    val maps = (0 until 400).map(_ => MockData.genValue(rnd,
        MapType(LongType, LongType, valueContainsNull = false), cfg))
      .collect { case m: Map[_, _] => m }
    assert(maps.nonEmpty)
    maps.foreach(m =>
      assert(m.values.forall(_ != null), "valueContainsNull=false map drew a null value"))
  }

  test("generated frames of random schemas survive a parquet roundtrip") {
    (10L to 12L).foreach { seed =>
      val rnd = new Random(seed)
      val schema = MockData.genSchema(rnd, 5)
      val df = MockData.genDataFrame(spark, seed, schema, 25)
      val out = java.nio.file.Files.createTempDirectory(s"graft_prop$seed").toString
      df.write.mode("overwrite").parquet(out)
      val back = spark.read.parquet(out)
      assert(back.count() == 25, s"seed=$seed rows")
      assert(back.schema.fields.map(_.name).toSet == schema.fields.map(_.name).toSet,
        s"seed=$seed columns")
    }
  }
}
