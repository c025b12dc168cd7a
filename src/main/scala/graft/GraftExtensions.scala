package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{IsoDuration, TextOps}
import graft.similarity.Similarity

/** SparkSessionExtensions hook registering the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql` text (metadata-driven
  * pipelines, DQ rule SQL, warehouse transformations) can call them exactly
  * like built-ins:
  *
  *   spark.sql("SELECT iso_duration_micros('PT45M')")
  *   spark.sql("SELECT dot_product(a.v, b.v) FROM ...")
  *
  * Wire-up: `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions` on spark-submit —
  * the injection path Spark gives libraries that extend the engine without
  * forking it (preferred over session-local `udf.register`, which would
  * bypass codegen and per-session registries).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Whole-operator extension: per-key top-k logical node → strategy
    // (partial/final bounded-heap split) + key-filter pushdown rule.
    ext.injectPlannerStrategy(_ => graft.plans.TopK.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopK.PushFilterThroughTopK)
    ext.injectFunction((
      FunctionIdentifier("iso_duration_micros"),
      info("iso_duration_micros", "iso_duration_micros(iso) - ISO-8601 duration string to microseconds (null on malformed)."),
      (children: Seq[Expression]) => IsoDuration.ParseIsoDuration(children.head, strict = false)))
    ext.injectFunction((
      FunctionIdentifier("format_iso_duration"),
      info("format_iso_duration", "format_iso_duration(micros) - microseconds to ISO-8601 duration string."),
      (children: Seq[Expression]) => IsoDuration.FormatIsoDuration(children.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - sequential-fold dot product of two array<double> (codegen'd)."),
      (children: Seq[Expression]) => Similarity.DotProduct(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("normalize_nfc"),
      info("normalize_nfc", "normalize_nfc(str) - Unicode NFC normalization (canonical composition)."),
      (children: Seq[Expression]) => TextOps.NormalizeNfc(children.head)))
    ext.injectFunction((
      FunctionIdentifier("l2sq_distance"),
      info("l2sq_distance", "l2sq_distance(a, b) - sequential-fold squared L2 distance of two array<double> (codegen'd)."),
      (children: Seq[Expression]) => Similarity.L2SqDistance(children.head, children(1))))
  }
}
