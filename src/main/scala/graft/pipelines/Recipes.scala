package graft.pipelines

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IsoDuration
import graft.quality.DataQuality
import graft.sources.{DataReader, DataWriter, FileType, RepartitionPolicy, Standardize}

/** The flagship end-to-end pipeline: recipes JSON → clean/cast (task1) →
  * difficulty classification + per-group duration average (task2).
  *
  * Reference behavior (src/com/vitthalmirji/datapipelines/recipe_tasks.py:
  * 53-187) with the Python-UDF hot path eliminated: ISO-duration parse/add
  * are Catalyst expressions over long microseconds, the difficulty
  * classifier is pure when/otherwise, and the per-difficulty average is a
  * distributed Aggregator instead of `collect_list` + a driver-side Python
  * loop (which would OOM the driver long before 100 TB).
  *
  * Golden parity (BASELINE.md): task1 → 1042 rows, 9 columns; task2 → 3 rows
  * easy=PT7M5.086705S, hard=PT2H43M37.105263S, medium=PT41M53.288136S.
  */
object Recipes {

  val renames: Map[String, String] = Map(
    "cookTime" -> "cook_time", "prepTime" -> "prep_time",
    "datePublished" -> "date_published", "recipeYield" -> "recipe_yield")

  /** task1: ingest + clean. Null/blank durations default to "PT" (zero);
    * ingredients split on newline; dates/yields cast with null-on-junk
    * (reference: recipe_tasks.py:98-114). */
  def task1(spark: SparkSession, inputDir: String, outputDir: String,
            dqRulesJson: Option[String] = None,
            reportDir: Option[String] = None): DataFrame = {
    val raw = DataReader.read(spark, FileType.Json, inputDir,
      options = Map("encoding" -> "utf-8"))

    dqRulesJson.foreach { json =>
      val (dqId, rules) = DataQuality.rulesFromJson(json)
      val report = DataQuality.run(spark, raw, dqId, rules)
      reportDir.foreach(d => DataQuality.writeHtmlReport(report, s"$d/$dqId.html"))
      // The DQ pass is report-only (the reference pipeline cleans rather
      // than rejects), but a failed rule must be OBSERVABLE even when no
      // reportDir was given — the rule jobs are a full scan of the input;
      // silently discarding their verdicts made that scan pure waste.
      if (!report.overallPassed)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "task1 DQ report {}: {} of {} rules failed — {}", dqId,
          Integer.valueOf(report.results.count(!_.passed)),
          Integer.valueOf(report.results.size),
          report.results.filterNot(_.passed)
            .map(r => s"${r.ruleId}/${r.ruleName}: ${r.violations} violations")
            .mkString("; "))
    }

    val cleaned = Standardize.renameColumns(raw, renames)
      .withColumn("cook_time",
        when(col("cook_time").isNull || trim(col("cook_time")) === "", lit("PT"))
          .otherwise(trim(col("cook_time"))))
      .withColumn("prep_time",
        when(col("prep_time").isNull || trim(col("prep_time")) === "", lit("PT"))
          .otherwise(trim(col("prep_time"))))
      // try_* variants: ANSI mode (Spark 4 default) would throw on junk like
      // "Serves 4."; the reference's Spark-2 semantics are null-on-junk.
      .withColumn("date_published", graft.functions.ColumnOps.toDateSafe(col("date_published"), "yyyy-MM-dd"))
      .withColumn("recipe_yield", col("recipe_yield").try_cast("int"))
      .withColumn("ingredients", split(col("ingredients"), "\n"))
      .withColumn("description", trim(col("description")))

    DataWriter.write(cleaned, FileType.Parquet, outputDir,
      mode = SaveMode.Overwrite,
      policy = RepartitionPolicy.ByColumns(Seq("date_published")))
    cleaned
  }

  /** Difficulty + total time, computed once as columns (reference returns a
    * struct from a Python UDF; recipe_tasks.py:157-160). */
  def withDifficulty(df: DataFrame): DataFrame = {
    val total = IsoDuration.durationMicros(col("cook_time")) +
      IsoDuration.durationMicros(col("prep_time"))
    df.withColumn("total_time_micros", total)
      .withColumn("difficulty", IsoDuration.difficulty(col("total_time_micros")))
  }

  /** task2: per-difficulty average cooking time, ISO-serialized at the
    * boundary (reference: recipe_tasks.py:125-187). */
  def task2(spark: SparkSession, task1Dir: String, outputDir: String): DataFrame = {
    val out = withDifficulty(DataReader.read(spark, FileType.Parquet, task1Dir))
      .groupBy(col("difficulty"))
      .agg(IsoDuration.avgDuration(col("total_time_micros"))
        .as("avg_total_cooking_time"))
      .orderBy(col("difficulty"))
    DataWriter.write(out, FileType.Csv, outputDir,
      options = Map("header" -> "true", "encoding" -> "utf-8"),
      policy = RepartitionPolicy.Coalesce(1))
    out
  }
}
