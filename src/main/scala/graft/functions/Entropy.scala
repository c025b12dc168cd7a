package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document Shannon character entropy as a native codegen'd expression
  * — (n_chars, entropy µnat-quantized) in ONE pass over the document.
  *
  * Semantics are bit-for-bit the corpus formulation this replaces
  * (explode code points → (doc, char) hash-agg → totals join → per-doc
  * agg): code points counted exactly like `regexp_extract_all(text,
  * '(?s).')` / DuckDB's code-point `string_split`, each ln(p) computed
  * with `StrictMath.log` (what Spark's `log` calls) and quantized ONCE to
  * nano-units, then exact integer arithmetic to the half-up µnat result —
  * so the DuckDB oracle's restatement agrees digit-for-digit.
  *
  * Why an expression: entropy needs no corpus statistics, yet the explode
  * formulation shuffles a corpus×CHARS-sized exchange (three orders of
  * magnitude above corpus row count) through two hash-aggs and a join to
  * compute what is a per-row fold. Here the whole statistic runs inside
  * WholeStageCodegen at scan parallelism: zero shuffle, zero join, one
  * small per-doc frequency table. NULL for a document with no characters
  * (the explode formulation drops such docs; callers filter NULLs).
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_entropy requires a string column, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      ${ev.value} = graft.functions.CharEntropy.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {

  /** One-pass (n_chars, entropy); null when the document has no
    * characters. Frequency table is per-distinct-code-point — bounded by
    * the alphabet, not the document. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    if (str.isEmpty) return null
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      n += 1L
      i += Character.charCount(cp)
    }
    // Σ nc · floor(ln(nc/n)·1e9 + 0.5), then the half-up integer division
    // to µnats — the quantize-once discipline of the corpus formulation.
    // Exact long ops (multiplyExact/addExact): |Σ q·nc| can exceed
    // Long.MaxValue for a high-entropy document past ~0.5 GB of text
    // (|q| ≈ ln(n)·1e9), and a silent wrap would emit garbage entropy for
    // exactly the pathological inputs an entropy filter exists to catch —
    // throw loudly instead. Cost is nil: this loop runs once per DISTINCT
    // code point (alphabet-bounded), not per character.
    var sSum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val nc = it.next()(0)
      val q = Math.floor(
        StrictMath.log(nc.toDouble / n.toDouble) * 1e9 + 0.5).toLong
      sSum = Math.addExact(sSum, Math.multiplyExact(q, nc))
    }
    val microNats = Math.addExact(Math.multiplyExact(sSum, -2L), n * 1000L) /
      (2L * n * 1000L)
    new GenericInternalRow(Array[Any](n, microNats.toDouble / 1e6))
  }

  /** Column wrapper: struct(n_chars, entropy), NULL for empty docs. */
  def charEntropy(c: Column): Column =
    Bridge.toColumn(CharEntropyExpr(Bridge.toExpr(c)))
}
