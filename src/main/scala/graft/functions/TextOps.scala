package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis surface for large-scale training-data pipelines: tokenizing,
  * shingling, quality scoring, language ID, and document fingerprinting.
  *
  * Everything here is a pure `Column => Column` composition of codegen'd
  * built-ins (higher-order array functions, regexes, md5) — no UDFs, so the
  * whole surface runs inside whole-stage codegen and scales per-row with no
  * shuffle. Hashes are md5-derived (not `hash`/`xxhash64`) so results are
  * deterministic across engines and partitionings — required for the DuckDB
  * oracle and for reproducible dedup at 100 TB.
  *
  * Extends the reference's text handling (word count, utils/Utilities.py:30-36)
  * to the dedup/quality operators a training-data pipeline needs.
  */
object TextOps {

  /** Mersenne prime 2^31-1: all hash arithmetic stays below 2^62 (no silent
    * Spark overflow / loud DuckDB overflow divergence). */
  val P31 = 2147483647L

  /** Whitespace tokens, empties removed. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * punctuation marks each count as one token. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Stable 31-bit hash of a string column (md5-derived, engine-agnostic). */
  def h31(c: Column): Column = ColumnOps.stable64(c) % P31

  /** Distinct word n-gram shingles as strings; empty array when the doc has
    * fewer than n tokens (sequence() would otherwise run backwards).
    *
    * The token array is bound through a single-element array + lambda so it
    * is evaluated ONCE per row: referencing `tokens(c)` directly inside the
    * position lambda would re-split the whole document for every shingle
    * position (higher-order functions are interpreted and do not hoist
    * loop-invariant subtrees), turning shingling O(len²). */
  def wordShingles(c: Column, n: Int): Column =
    flatten(transform(array(tokens(c)), ts =>
      when(size(ts) < n, array().cast("array<string>"))
        .otherwise(array_distinct(transform(
          sequence(lit(1), size(ts) - (n - 1)),
          i => concat_ws(" ", slice(ts, i, lit(n))))))))

  /** ALL word n-gram shingles, duplicates kept (same single-evaluation
    * binding trick as [[wordShingles]]) — repetition analysis needs the
    * multiset; dedup/similarity wants the distinct set. */
  def wordShinglesAll(c: Column, n: Int): Column =
    flatten(transform(array(tokens(c)), ts =>
      when(size(ts) < n, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), size(ts) - (n - 1)),
          i => concat_ws(" ", slice(ts, i, lit(n)))))))

  /** Polynomial rolling hash of the full string, mod P31 — the classic
    * Karp-Rabin document fingerprint. Left fold over code points, so
    * cross-engine exact (oracles restate it as the portable
    * `aggregate(transform(split(c, ''), ascii), ...)` HOF fold — Spark's
    * empty-pattern split yields exactly the code points, and `ascii` is
    * codePointAt(0), so the codegen kernel below is the same fold without
    * the per-character UTF8String array the HOF version allocates: a
    * document's fingerprint costs one String and zero per-char objects). */
  def rollingHash(c: Column): Column =
    Bridge.toColumn(RollingHash31Expr(Bridge.toExpr(c)))

  /** The HOF formulation of [[rollingHash]] — kept as the parity twin the
    * spec checks the kernel against (it IS the oracle restatement). */
  private[functions] def rollingHashHof(c: Column): Column =
    aggregate(transform(split(c, ""), ch => ascii(ch)),
      lit(0L), (acc, x) => (acc * 31L + x) % P31)

  /** [[rollingHash]]'s codegen kernel: fold code points into
    * `(acc * 31 + cp) % P31`. */
  case class RollingHash31Expr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType.isInstanceOf[StringType])
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_hash31 requires a string column, got ${child.dataType}")
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "rolling_hash31"
    override protected def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        TextOps.rollingHash31(input.asInstanceOf[UTF8String]))
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.rollingHash31($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One-pass word n-gram multiset stats — (n_grams, n_distinct) — the
    * Gopher repetition filter's kernel. Bit-for-bit the
    * `wordShinglesAll` → `size`/`size(array_distinct)` formulation (the
    * shape the q80 oracle restates), without materializing the shingle
    * string ARRAY column and running array_distinct's UTF8String
    * machinery per document: one tokenizer pass, one StringBuilder per
    * shingle, one HashSet — distinctness still decided on the real
    * joined strings, so no hash-collision risk enters the counts. NULL
    * for documents with fewer than n tokens (the array formulation
    * yields an empty array there; callers filter). */
  case class NGramStatsExpr(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1)
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType.isInstanceOf[StringType])
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_stats requires a string column, got ${child.dataType}")
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_grams",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_distinct",
        org.apache.spark.sql.types.LongType, nullable = false)))
    override def nullable: Boolean = true
    override def prettyName: String = "ngram_stats"
    override protected def nullSafeEval(input: Any): Any =
      TextOps.ngramStats(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
        ${ev.value} = graft.functions.TextOps.ngramStats($c, $n);
        if (${ev.value} == null) { ${ev.isNull} = true; }
        """
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** (n_grams, n_distinct) over whitespace-token n-grams joined with a
    * single space (exactly `concat_ws(" ", slice(tokens, i, n))`); null
    * when the document has fewer than n tokens. */
  def ngramStats(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val parts = SimHash31.splitTokens(s.toString)
    // tokens(): whitespace split, empties removed — count and keep order.
    var m = 0
    var i = 0
    while (i < parts.length) { if (parts(i).nonEmpty) m += 1; i += 1 }
    if (m < n) return null
    val toks = new Array[String](m)
    var k = 0
    i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) { toks(k) = parts(i); k += 1 }
      i += 1
    }
    val total = (m - n + 1).toLong
    val seen = new java.util.HashSet[String](math.max(16, (total * 2).toInt))
    val sb = new java.lang.StringBuilder
    var p = 0
    while (p <= m - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(p + j))
        j += 1
      }
      seen.add(sb.toString)
      p += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, seen.size.toLong))
  }

  /** Column wrapper for [[NGramStatsExpr]]. */
  def ngramStats(c: Column, n: Int): Column =
    Bridge.toColumn(NGramStatsExpr(Bridge.toExpr(c), n))

  /** Code-point fold behind [[RollingHash31Expr]]. */
  def rollingHash31(s: UTF8String): Long = {
    val str = s.toString
    var v = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      v = (v * 31L + cp) % P31
      i += Character.charCount(cp)
    }
    v
  }

  /** Winnowing-style min-fingerprint: the minimum rolling hash over word
    * n-gram shingles. Two documents sharing any low-hash shingle collide —
    * a cheap near-dup prefilter. Null for docs shorter than n tokens. */
  def minShingleFingerprint(c: Column, n: Int): Column =
    array_min(transform(wordShingles(c, n), s => rollingHash(s)))

  // ---- unicode normalization ---------------------------------------------

  /** Unicode NFC normalization as a Catalyst expression — composed and
    * decomposed renderings of the same text ("é" vs "e"+U+0301) must hash
    * identically or every hash-based dedup silently treats them as
    * different documents. Spark has no normalization built-in; this wraps
    * `java.text.Normalizer` (the JDK's conformant NFC), interpreted per row
    * (CodegenFallback — normalization cost dwarfs the call overhead). */
  case class NormalizeNfc(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "normalize_nfc"
    override protected def nullSafeEval(input: Any): Any =
      UTF8String.fromString(java.text.Normalizer.normalize(
        input.asInstanceOf[UTF8String].toString,
        java.text.Normalizer.Form.NFC))
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def normalizeNfc(c: Column): Column =
    Bridge.toColumn(NormalizeNfc(Bridge.toExpr(c)))

  // ---- PII scrubbing -----------------------------------------------------

  /** Cross-engine-safe redaction patterns (no lookaround, POSIX-compatible
    * classes) — the minimum a training corpus needs before release. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val PhonePattern = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"

  /** Redact emails, URLs, and phone-shaped digit runs to typed placeholder
    * tokens. Order matters: URLs first (emails can appear inside query
    * strings), then emails, then phones. */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Count of email-shaped tokens (pre-scrub audit metric). */
  def emailCount(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailPattern), lit(0)))

  // ---- quality scoring ---------------------------------------------------

  /** Small English stopword list used by ratio features (deterministic,
    * mirrors the oracle SQL literally). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "in", "on", "to", "is")

  def stopwordRatio(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => t.isInCollection(Stopwords))).cast("double")
        / size(toks).cast("double"))
  }

  /** Fraction of characters that are neither alphanumeric nor whitespace. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0)
      .otherwise(length(regexp_replace(c, "[a-zA-Z0-9\\s]", "")).cast("double")
        / length(c).cast("double"))

  /** 6-dp quantization that is bit-deterministic across engines:
    * `floor(x·1e6 + 0.5) / 1e6`. The repo-wide discipline (Stats.scala) —
    * floor of identical doubles is exact where ROUND(double, 6) goes
    * through each engine's own decimal rounding (Spark: BigDecimal
    * HALF_UP on the printed string; DuckDB: float arithmetic) and can
    * disagree by 1 ulp at a rounding boundary. */
  def quant6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Composite heuristic quality score in [0,1]: rewards reasonable length,
    * penalizes stopword stuffing and punctuation noise. Plain double
    * arithmetic (division + multiplication only), [[quant6]]-stabilized →
    * cross-engine exact. */
  def qualityScore(c: Column): Column = {
    val toks = size(tokens(c)).cast("double")
    val lenTerm = least(toks / 100.0, lit(1.0))
    quant6(lenTerm * 0.5 + (lit(1.0) - stopwordRatio(c)) * 0.3
      + (lit(1.0) - punctRatio(c)) * 0.2)
  }

  // ---- language ID -------------------------------------------------------

  /** Marker unigrams per language — a tiny n-gram profile classifier. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "les", "et", "une"))

  /** Predicted language: argmax of marker-token counts, `und` (undetermined)
    * when every profile scores zero. Ties break by profile order (en first) —
    * the oracle SQL encodes the same order. */
  def langId(c: Column): Column = {
    val toks = tokens(c)
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isInCollection(markers)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best && best > 0, lang).otherwise(els)
    }
  }
}
