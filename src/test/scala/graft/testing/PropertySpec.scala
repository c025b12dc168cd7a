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
