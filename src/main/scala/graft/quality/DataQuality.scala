package graft.quality

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps

/** Data-quality rule engine: unique / not-null / arbitrary-SQL rules executed
  * against a DataFrame, with a structured result set and an HTML report.
  *
  * Reference semantics (src/com/vitthalmirji/utils/data_quality.py:50-223):
  *  - `unique`: count of key groups appearing more than once; pass iff 0;
  *  - `not null`: rows where ANY listed column is null or blank; pass iff 0;
  *  - `query`: rule SQL runs against the DataFrame registered as view
  *    `temp`; pass iff the query returns zero rows.
  *
  * Each rule is one Spark action over a declarative plan, so Catalyst pushes
  * filters/pruning into the scan; at 100 TB, prefer [[summarize]] which
  * fuses all unique+not-null rules into a single pass.
  */
object DataQuality {

  sealed trait Rule { def id: String; def name: String }
  final case class UniqueRule(id: String, name: String, columns: Seq[String]) extends Rule
  final case class NotNullRule(id: String, name: String, columns: Seq[String]) extends Rule
  final case class QueryRule(id: String, name: String, sql: String) extends Rule
  /** Beyond the reference's three types: value-domain check — violations =
    * rows where `column` falls outside [min, max] (null bounds = open). */
  final case class RangeRule(id: String, name: String, column: String,
                             min: Option[Double], max: Option[Double]) extends Rule
  /** Referential integrity — violations = child rows whose FK has no match
    * in the parent (a left_anti count; orphan detection). */
  final case class FkRule(id: String, name: String, childCols: Seq[String],
                          parent: DataFrame, parentCols: Seq[String]) extends Rule

  final case class RuleResult(ruleId: String, ruleName: String, ruleType: String,
                              violations: Long, passed: Boolean,
                              error: Option[String] = None)

  final case class DqReport(dqId: String, results: Seq[RuleResult]) {
    def overallPassed: Boolean = results.forall(_.passed)
  }

  /** Duplicated-key group count (reference: data_quality.py:64-65). */
  def duplicateKeyGroups(df: DataFrame, cols: Seq[String]): Long =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).count()

  /** Rows where any listed column is null/blank (data_quality.py:70-87). */
  def nullOrBlankRows(df: DataFrame, cols: Seq[String]): Long =
    df.filter(cols.map(c => ColumnOps.isNullOrBlank(col(c))).reduce(_ || _)).count()

  /** Rows outside the [min, max] domain (nulls don't violate — that's
    * NotNullRule's job; one concern per rule). */
  def outOfRangeRows(df: DataFrame, column: String,
                     min: Option[Double], max: Option[Double]): Long = {
    val c = col(column)
    val below = min.map(m => c < m).getOrElse(lit(false))
    val above = max.map(m => c > m).getOrElse(lit(false))
    df.filter(below || above).count()
  }

  /** Child rows whose FK tuple has no parent match (left_anti orphans);
    * rows with any null FK column are skipped (not referential violations). */
  def orphanRows(child: DataFrame, childCols: Seq[String],
                 parent: DataFrame, parentCols: Seq[String]): Long = {
    val p = parent.select(parentCols.zip(childCols)
      .map { case (pc, cc) => col(pc).as(cc) }: _*).distinct()
    child.filter(childCols.map(c => col(c).isNotNull).reduce(_ && _))
      .join(p, childCols, "left_anti").count()
  }

  def runRule(spark: SparkSession, df: DataFrame, rule: Rule): RuleResult = {
    val attempt = Try(rule match {
      case UniqueRule(_, _, cols) => duplicateKeyGroups(df, cols)
      case NotNullRule(_, _, cols) => nullOrBlankRows(df, cols)
      case RangeRule(_, _, c, mn, mx) => outOfRangeRows(df, c, mn, mx)
      case FkRule(_, _, cc, parent, pc) => orphanRows(df, cc, parent, pc)
      case QueryRule(_, _, sql) =>
        // The reference contract (data_quality.py:102): rule SQL references
        // the frame as view `temp`. The rule runs in a CLONE of the
        // caller's session (shared SparkContext/cache, COPIED state), which
        // satisfies every constraint at once: the REAL name registers (no
        // token rewrite — the old rewrite mangled string literals like
        // `WHERE category = 'temp'` and missed case variants `FROM TEMP`),
        // a user's own `temp` view in the main session is never clobbered
        // (the registration lands in the clone's copied catalog only),
        // concurrent DQ runs each see only their own registration, AND —
        // unlike newSession(), whose empty catalog broke this — rule SQL
        // can still join the caller's OTHER temp views (lookup tables,
        // valid-code lists).
        val scoped = org.apache.spark.sql.graft.Bridge.cloneSession(spark)
        org.apache.spark.sql.graft.Bridge
          .ofRows(scoped, df.queryExecution.analyzed)
          .createOrReplaceTempView("temp")
        scoped.sql(sql).count()
    })
    val rtype = rule match {
      case _: UniqueRule => "unique"
      case _: NotNullRule => "not null"
      case _: QueryRule => "query"
      case _: RangeRule => "range"
      case _: FkRule => "fk"
    }
    attempt match {
      case Success(v) => RuleResult(rule.id, rule.name, rtype, v, v == 0)
      case Failure(e) => RuleResult(rule.id, rule.name, rtype, -1, passed = false,
        error = Some(e.getMessage))
    }
  }

  def run(spark: SparkSession, df: DataFrame, dqId: String,
          rules: Seq[Rule]): DqReport =
    DqReport(dqId, rules.map(r => runRule(spark, df, r)))

  /** Single-pass fused check: all unique + not-null rules evaluated in ONE
    * aggregation over the data (conditional-count columns), instead of one
    * job per rule. At scale this is the difference between k scans and 1.
    * Unique rules are approximated exactly via count-distinct deltas:
    * duplicate key groups = countDistinct(keys with count>1) needs a group
    * pass, so uniques here report `rows − distinct keys` (excess rows), which
    * is 0 exactly when the rule passes — same pass/fail decision.
    */
  def summarize(df: DataFrame, uniques: Seq[UniqueRule],
                notNulls: Seq[NotNullRule]): DataFrame = {
    require(uniques.nonEmpty || notNulls.nonEmpty,
      "summarize needs at least one unique or not-null rule")
    val aggs =
      uniques.map(r =>
        (count(lit(1)) - count_distinct(struct(r.columns.map(col): _*)))
          .as(s"excess_${r.id}")) ++
      notNulls.map(r =>
        // coalesce: sum() over ZERO rows is NULL, and an empty input must
        // report 0 violations (vacuously true), not a NULL that fails a
        // `violations == 0` check or NPEs a getLong
        coalesce(sum(when(r.columns.map(c => ColumnOps.isNullOrBlank(col(c)))
            .reduce(_ || _), 1L)
          .otherwise(0L)), lit(0L)).as(s"nullblank_${r.id}"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  // ---- JSON config (reference: conf/data-quality/rules/*.json) -----------

  /** Parse `{dq_id, rules:[{rule_id,name,rule_type,columns?|query?}]}` using
    * Spark's bundled Jackson. */
  def rulesFromJson(json: String): (String, Seq[Rule]) = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val root = new ObjectMapper().readTree(json)
    val dqId = Option(root.get("dq_id")).map(_.asText).getOrElse("dq")
    val rulesNode = Option(root.get("rules")).filterNot(_.isNull).getOrElse(
      throw new IllegalArgumentException("rules JSON missing required array 'rules'"))
    val it = rulesNode.elements()
    val rules = Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).map { r =>
      // filterNot(_.isNull): Jackson returns a present NullNode for an
      // explicit JSON null, so a bare Option(...) treated "min": null as
      // Some(0.0) (asDouble of null) and "name": null as the string
      // "null" — an explicit null must read as absent.
      def opt(field: String) = Option(r.get(field)).filterNot(_.isNull)
      // Missing REQUIRED fields get a named error (which rule, which
      // field), not the bare NPE a raw r.get(...).asText chain threw.
      def req(field: String) = opt(field).getOrElse(
        throw new IllegalArgumentException(
          s"rule ${opt("rule_id").map(_.asText).getOrElse("<no rule_id>")}: " +
            s"missing required field '$field'"))
      val id = req("rule_id").asText
      val name = opt("name").map(_.asText).getOrElse(id)
      def cols = {
        val ce = req("columns").elements()
        Iterator.continually(ce).takeWhile(_.hasNext).map(_.next().asText).toSeq
      }
      req("rule_type").asText match {
        case "unique" => UniqueRule(id, name, cols)
        case "not null" => NotNullRule(id, name, cols)
        case "query" => QueryRule(id, name, req("query").asText)
        case "range" => RangeRule(id, name, req("column").asText,
          opt("min").map(_.asDouble), opt("max").map(_.asDouble))
        // FkRule needs a parent DataFrame — constructed programmatically,
        // not from JSON config.
        case other => throw new IllegalArgumentException(s"Unknown rule_type '$other'")
      }
    }.toSeq
    (dqId, rules)
  }

  /** HTML report (reference: data_quality.py:137-223). Rule ids/names are
    * caller-supplied strings — escaped so a name like "checks <orders> &
    * returns" renders instead of breaking the table (and a hostile name
    * can't inject markup into a report viewed in a browser). */
  def htmlReport(report: DqReport): String = {
    def esc(s: String): String = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")
    def table(title: String, rows: Seq[RuleResult]): String =
      if (rows.isEmpty) ""
      else s"""<h2>$title</h2><table border="1"><tr><th>rule</th><th>name</th><th>type</th><th>violations</th><th>error</th></tr>""" +
        rows.map(r => s"<tr><td>${esc(r.ruleId)}</td><td>${esc(r.ruleName)}</td><td>${esc(r.ruleType)}</td><td>${r.violations}</td><td>${esc(r.error.getOrElse(""))}</td></tr>").mkString +
        "</table>"
    val (pass, fail) = report.results.partition(_.passed)
    s"""<html><body><h1>Data quality report: ${esc(report.dqId)} — ${if (report.overallPassed) "PASSED" else "FAILED"}</h1>
       |${table("Failed rules", fail)}
       |${table("Passed rules", pass)}
       |</body></html>""".stripMargin
  }

  def writeHtmlReport(report: DqReport, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p, htmlReport(report))
  }
}
