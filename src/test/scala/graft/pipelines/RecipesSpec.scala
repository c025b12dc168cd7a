package graft.pipelines

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden end-to-end parity with the reference's recipe pipeline
  * (BASELINE.md): task1 → 1042 rows / 9 columns; task2 → the three golden
  * per-difficulty ISO averages. Reads the reference's input data in place
  * (read-only); skipped if absent. */
class RecipesSpec extends SparkSpec {

  private val inputDir = "/root/reference/resources/data/recipes/input"
  private lazy val out = Files.createTempDirectory("graft-recipes").toString

  private def available = new java.io.File(inputDir).exists()

  test("task1 cleans 1042 recipes into 9 typed columns") {
    assume(available, s"$inputDir not present")
    val t1 = Recipes.task1(spark, inputDir, s"$out/task1")
    assert(t1.count() == 1042)
    val schema = spark.read.parquet(s"$out/task1").schema
    assert(schema.fields.length == 9)
    assert(schema("ingredients").dataType.typeName == "array")
    assert(schema("date_published").dataType.typeName == "date")
    assert(schema("recipe_yield").dataType.typeName == "integer")
    // blank/null durations defaulted to "PT"
    val blanks = spark.read.parquet(s"$out/task1")
      .filter(col("cook_time") === "PT" || col("prep_time") === "PT").count()
    assert(blanks > 0)
  }

  test("task2 reproduces the golden per-difficulty ISO averages") {
    assume(available, s"$inputDir not present")
    Recipes.task1(spark, inputDir, s"$out/task1")
    val t2 = Recipes.task2(spark, s"$out/task1", s"$out/task2")
    val got = rows(t2).map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "easy" -> "PT7M5.086705S",
      "hard" -> "PT2H43M37.105263S",
      "medium" -> "PT41M53.288136S"))
    // CSV golden artifact written with header
    val csv = spark.read.option("header", "true").csv(s"$out/task2")
    assert(csv.columns.toSeq == Seq("difficulty", "avg_total_cooking_time"))
  }
}

class LauncherSpec extends SparkSpec {
  import java.time.LocalDate
  import graft.launcher.Launcher

  test("dateChunks covers the range inclusively without overlap") {
    val chunks = Launcher.dateChunks(
      LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 10), 3)
    assert(chunks == Seq(
      (LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 3)),
      (LocalDate.of(2024, 1, 4), LocalDate.of(2024, 1, 6)),
      (LocalDate.of(2024, 1, 7), LocalDate.of(2024, 1, 9)),
      (LocalDate.of(2024, 1, 10), LocalDate.of(2024, 1, 10))))
  }

  test("renderSubmit includes reference-parity defaults") {
    val cmd = Launcher.renderSubmit(Launcher.SubmitConf(
      "app", "graft.Main", "/jars/graft.jar", args = Seq("--in", "x")))
    assert(cmd.startsWith("spark-submit"))
    assert(cmd.contains("--conf spark.dynamicAllocation.enabled=false"))
    assert(cmd.contains("--class graft.Main") && cmd.endsWith("--in x"))
  }
}
