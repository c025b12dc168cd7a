package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row MinHash signature as a native codegen'd Catalyst expression —
  * the [[SimHash31Expr]] treatment applied to MinHash.
  *
  * Semantics are bit-for-bit the library's canonical formulation
  * ([[graft.dedup.Dedup.minhashSignature]] / `minhashSignatures`): word
  * `shingleN`-gram shingles joined with a single space, per-shingle
  * `h31` = first 15 hex chars of md5 as a base-16 long mod 2^31-1, and
  * per permutation i the min of `(h·(2i+3) + (7919i+1)) mod (2^31-1)`
  * over the shingle set (min over the multiset equals min over the
  * distinct set, so shingle dedup is unnecessary). NULL for documents
  * with fewer than `shingleN` tokens, matching the explode formulation
  * where such docs produce no rows.
  *
  * Why: the corpus formulation exploded every shingle into a
  * corpus×shingles exchange feeding `numPerms` min-aggregates. This
  * expression computes the signature in one pass per document inside
  * WholeStageCodegen — zero shuffle, linear shingle hashing — so
  * signature derivation parallelizes with the scan at any scale.
  */
case class MinHashExpr(child: Expression, numPerms: Int, shingleN: Int)
    extends UnaryExpression {

  require(numPerms > 0 && shingleN > 0)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash requires a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val sig = MinHash.compute(
      input.asInstanceOf[UTF8String].toString, numPerms, shingleN)
    if (sig == null) null else UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("sig")
      s"""
      long[] $arr = graft.functions.MinHash.compute(
        $c.toString(), $numPerms, $shingleN);
      if ($arr == null) { ${ev.isNull} = true; }
      else { ${ev.value} =
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of positions where two long-array signatures agree — the MinHash
  * similarity estimator's kernel, as a codegen'd binary expression. The
  * HOF spelling (`size(filter(zip_with(a, b, _ === _), e => e))`) runs
  * interpreted lambdas and allocates two intermediate arrays PER PAIR;
  * at candidate-join volume (millions of pairs) that is the dominant
  * per-row cost. Compares over the common prefix length, like zip_with
  * on equal-length signatures. */
case class SigAgreeCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sig_agree_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ys = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (xs.getLong(i) == ys.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
      int $n = Math.min($xs.numElements(), $ys.numElements());
      int $c = 0;
      for (int $i = 0; $i < $n; $i++) {
        if ($xs.getLong($i) == $ys.getLong($i)) $c++;
      }
      ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object MinHash {

  /** Number of agreeing positions between two long-array signatures. */
  def agreeCount(a: Column, b: Column): Column =
    Bridge.toColumn(SigAgreeCountExpr(Bridge.toExpr(a), Bridge.toExpr(b)))

  /** MinHash signature of `s`; null when the document has fewer than
    * `shingleN` whitespace tokens (no shingles — the caller drops it,
    * like the explode formulation). */
  def compute(s: String, numPerms: Int, shingleN: Int): Array[Long] = {
    val parts = SimHash31.splitTokens(s)
    var nTok = 0
    var i = 0
    while (i < parts.length) { if (parts(i).nonEmpty) nTok += 1; i += 1 }
    if (nTok < shingleN) return null
    // compact the non-empty tokens in place order-preserving
    val toks = new Array[String](nTok)
    var w = 0
    i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) { toks(w) = parts(i); w += 1 }
      i += 1
    }
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i + shingleN <= nTok) {
      sb.setLength(0)
      var k = 0
      while (k < shingleN) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val h = SimHash31.h31(sb.toString)
      var p = 0
      while (p < numPerms) {
        val v = (h * (2L * p + 3L) + (7919L * p + 1L)) % TextOps.P31
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    mins
  }

  /** Column wrapper; NULL for docs with fewer than `shingleN` tokens. */
  def signature(c: Column, numPerms: Int, shingleN: Int): Column =
    Bridge.toColumn(MinHashExpr(Bridge.toExpr(c), numPerms, shingleN))
}
