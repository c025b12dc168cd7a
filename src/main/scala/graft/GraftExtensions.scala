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

  /** Arity gate in front of each builder: SQL text with the wrong argument
    * count gets the usage string back, not the builder's raw
    * IndexOutOfBoundsException — these functions are called from
    * metadata-driven SQL (DQ rules, warehouse transforms) where an opaque
    * crash carries no hint of which call was malformed. */
  private def arity(n: Int, usage: String)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.length != n)
        throw new IllegalArgumentException(
          s"expected $n argument(s), got ${children.length}; usage: $usage")
      build(children)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Whole-operator extension: per-key top-k logical node → strategy
    // (partial/final bounded-heap split) + key-filter pushdown rule.
    ext.injectPlannerStrategy(_ => graft.plans.TopK.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopK.PushFilterThroughTopK)
    def fn(name: String, n: Int, usage: String)(
        build: Seq[Expression] => Expression): Unit =
      ext.injectFunction(
        (FunctionIdentifier(name), info(name, usage), arity(n, usage)(build)))
    fn("iso_duration_micros", 1,
      "iso_duration_micros(iso) - ISO-8601 duration string to microseconds (null on malformed).")(
      children => IsoDuration.ParseIsoDuration(children.head, strict = false))
    fn("format_iso_duration", 1,
      "format_iso_duration(micros) - microseconds to ISO-8601 duration string.")(
      children => IsoDuration.FormatIsoDuration(children.head))
    fn("dot_product", 2,
      "dot_product(a, b) - sequential-fold dot product of two array<double> (codegen'd).")(
      children => Similarity.DotProduct(children.head, children(1)))
    fn("normalize_nfc", 1,
      "normalize_nfc(str) - Unicode NFC normalization (canonical composition).")(
      children => TextOps.NormalizeNfc(children.head))
    fn("l2sq_distance", 2,
      "l2sq_distance(a, b) - sequential-fold squared L2 distance of two array<double> (codegen'd).")(
      children => Similarity.L2SqDistance(children.head, children(1)))
  }
}
