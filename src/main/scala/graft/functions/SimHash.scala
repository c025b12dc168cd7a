package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row 31-bit SimHash as a native codegen'd Catalyst expression.
  *
  * Semantics are bit-for-bit the library's canonical SimHash formulation
  * (distinct whitespace tokens; per-token `h31` = first 15 hex chars of
  * md5 as a base-16 long mod 2^31-1; signature bit j set iff strictly
  * more than half the token hashes have bit j set — the +1/−1 sum of the
  * aggregation formulation and the majority test of the HOF formulation
  * are the same decision). NULL for a document with no tokens, matching
  * the explode formulation where a token-less doc produces no rows.
  *
  * Why an expression and not the explode+aggregate corpus formulation:
  * that shape shuffles a corpus×tokens-sized exchange into a 31-sum
  * hash aggregate — at warehouse scale the single biggest exchange in
  * the dedup family, and at any scale 31 conditional sums per exploded
  * row. This expression computes the signature in one tight pass per
  * document inside WholeStageCodegen (the generated code is one static
  * call), so signature derivation becomes embarrassingly parallel:
  * zero shuffle, zero join-back, linear token hashing.
  */
case class SimHash31Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash31 requires a string column, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash31"

  override protected def nullSafeEval(input: Any): Any = {
    val sig = SimHash31.compute(input.asInstanceOf[UTF8String].toString)
    if (sig < 0L) null else java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      ${ev.value} = graft.functions.SimHash31.compute($c.toString());
      if (${ev.value} < 0L) { ${ev.isNull} = true; ${ev.value} = 0L; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash31 {

  /** Mirrors Spark's `split(text, "\\s+")` (Java regex, UTF8String →
    * String round-trip) so the expression tokenizes exactly like
    * [[TextOps.tokens]]. */
  private val Whitespace = Pattern.compile("\\s+")

  private val Md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Raw whitespace split (may contain empty strings — callers filter),
    * shared with [[MinHash]] so both expressions tokenize identically. */
  private[functions] def splitTokens(s: String): Array[String] =
    Whitespace.split(s, -1)

  /** `TextOps.h31` of a single string, computed from the md5 bytes:
    * first 15 hex chars = 7 full bytes + the high nibble of byte 7,
    * exactly `conv(substring(md5(t), 1, 15), 16, 10) % (2^31-1)`. */
  private[functions] def h31(t: String): Long = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(t.getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    v = (v << 4) | ((d(7) >> 4) & 0xfL)
    v % TextOps.P31
  }

  /** 31-bit SimHash of `s`; −1 when the document has no tokens (the
    * caller maps it to NULL — a sentinel keeps the hot path primitive). */
  def compute(s: String): Long = {
    val parts = splitTokens(s)
    val seen = new java.util.HashSet[String](math.max(16, parts.length * 2))
    val counts = new Array[Int](31)
    var n = 0
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      if (t.nonEmpty && seen.add(t)) {
        n += 1
        val h = h31(t)
        var j = 0
        while (j < 31) {
          if (((h >> j) & 1L) == 1L) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    if (n == 0) return -1L
    var sig = 0L
    var j = 0
    while (j < 31) {
      if (2 * counts(j) > n) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Column wrapper; NULL for token-less documents. */
  def simhash(c: Column): Column = Bridge.toColumn(SimHash31Expr(Bridge.toExpr(c)))
}
