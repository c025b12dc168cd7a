package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ISO-8601 duration math with microsecond precision.
  *
  * The reference carries durations as ISO strings (`PT45M`) and does all
  * arithmetic in Python UDFs over `isodate`/`timedelta` (reference:
  * utils/helpers.py:99-145, datapipelines/recipe_tasks.py:157-203). Here the
  * parse/format steps are native Catalyst expressions at the string boundary
  * and everything in between is a plain `long` microseconds column — so
  * sums/averages/comparisons run inside whole-stage codegen instead of a
  * per-row Python round-trip.
  *
  * Formatting reproduces `isodate.duration_isoformat` exactly (golden parity:
  * `PT7M5.086705S`, zero → `P0D`) — see SURVEY.md §7.4.
  */
object IsoDuration {

  private val Pattern =
    """([+-]?)P(?:(\d+(?:[.,]\d+)?)W)?(?:(\d+(?:[.,]\d+)?)D)?(?:T(?:(\d+(?:[.,]\d+)?)H)?(?:(\d+(?:[.,]\d+)?)M)?(?:(\d+(?:[.,]\d+)?)S)?)?""".r

  private val MicrosPerSecond = 1000000L

  /** Parse an ISO-8601 duration (weeks/days/hours/minutes/seconds, fractions
    * allowed) to microseconds. `"PT"` parses to 0 like `isodate` does
    * (reference test: `PT` → `P0D`, tests/test_helpers.py:25-40). Throws on
    * malformed input — use [[tryParseMicros]] for null-on-failure.
    */
  def parseMicros(s: String): Long = s.trim match {
    case Pattern(sign, w, d, h, m, sec)
        if Seq(w, d, h, m, sec).exists(_ != null) || s.trim == "PT" || s.trim == "P" =>
      def part(v: String, unitMicros: Long): Long =
        if (v == null) 0L
        else new JBigDecimal(v.replace(',', '.'))
          .multiply(JBigDecimal.valueOf(unitMicros))
          .setScale(0, RoundingMode.HALF_EVEN).longValueExact()
      val total = part(w, 7L * 86400 * MicrosPerSecond) +
        part(d, 86400L * MicrosPerSecond) +
        part(h, 3600L * MicrosPerSecond) +
        part(m, 60L * MicrosPerSecond) +
        part(sec, MicrosPerSecond)
      if (sign == "-") -total else total
    case other =>
      throw new IllegalArgumentException(s"Malformed ISO-8601 duration: '$other'")
  }

  def tryParseMicros(s: String): Option[Long] =
    try Option(s).map(parseMicros) catch { case _: IllegalArgumentException => None }

  /** `isodate.duration_isoformat`-compatible rendering of microseconds. */
  def format(micros: Long): String = {
    if (micros == 0L) return "P0D"
    val sign = if (micros < 0) "-" else ""
    val abs = math.abs(micros)
    val days = abs / (86400L * MicrosPerSecond)
    var rem = abs % (86400L * MicrosPerSecond)
    val hours = rem / (3600L * MicrosPerSecond); rem %= 3600L * MicrosPerSecond
    val minutes = rem / (60L * MicrosPerSecond); rem %= 60L * MicrosPerSecond
    val seconds = rem / MicrosPerSecond
    val micro = rem % MicrosPerSecond
    val sb = new StringBuilder(sign).append('P')
    if (days > 0) sb.append(days).append('D')
    if (hours > 0 || minutes > 0 || seconds > 0 || micro > 0) {
      sb.append('T')
      if (hours > 0) sb.append(hours).append('H')
      if (minutes > 0) sb.append(minutes).append('M')
      if (seconds > 0 || micro > 0) {
        if (micro == 0) sb.append(seconds)
        else sb.append(f"$seconds%d.$micro%06d".reverse.dropWhile(_ == '0').reverse)
        sb.append('S')
      }
    }
    sb.toString
  }

  // ---- Catalyst expressions at the string boundary ----------------------

  /** string ISO duration → long micros; null on malformed when !strict. */
  case class ParseIsoDuration(child: Expression, strict: Boolean)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "iso_duration_micros"
    override protected def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      if (strict) java.lang.Long.valueOf(parseMicros(s))
      else tryParseMicros(s).map(java.lang.Long.valueOf).orNull
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** long micros → ISO duration string. */
  case class FormatIsoDuration(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "format_iso_duration"
    override protected def nullSafeEval(input: Any): Any =
      UTF8String.fromString(format(input.asInstanceOf[Long]))
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def durationMicros(c: Column, strict: Boolean = false): Column =
    Bridge.toColumn(ParseIsoDuration(Bridge.toExpr(c), strict))

  def formatDuration(microsCol: Column): Column =
    Bridge.toColumn(FormatIsoDuration(Bridge.toExpr(microsCol.cast("long"))))

  /** ISO + ISO → ISO (reference: helpers.py:122-145). */
  def addDurations(a: Column, b: Column): Column =
    formatDuration(durationMicros(a) + durationMicros(b))

  // ---- average aggregator ------------------------------------------------

  /** Typed average over duration-micros, rounding the mean half-to-even at
    * microsecond precision — bit-for-bit what Python's
    * `sum(timedeltas)/len(...)` does (reference: recipe_tasks.py:162-165,
    * 190-203) — then re-serialized as ISO. Distributed partial aggregation
    * (sum, count) instead of the reference's `collect_list` + driver-side
    * Python loop, which would OOM the driver long before 100 TB.
    */
  object AvgDuration extends Aggregator[java.lang.Long, (Long, Long), String] {
    override def zero: (Long, Long) = (0L, 0L)
    // addExact: ~1.1e8 day-scale durations overflow a long micros sum —
    // reachable at the design target (the q99/Money lesson) — and a plain
    // `+` inside an Aggregator wraps SILENTLY even under ANSI. Loud
    // beats garbage; callers needing bigger sums stage through decimal.
    override def reduce(b: (Long, Long), a: java.lang.Long): (Long, Long) =
      if (a == null) b else (Math.addExact(b._1, a.longValue()), b._2 + 1)
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (Math.addExact(a._1, b._1), a._2 + b._2)
    override def finish(r: (Long, Long)): String =
      if (r._2 == 0) null
      else format(JBigDecimal.valueOf(r._1)
        .divide(JBigDecimal.valueOf(r._2), 0, RoundingMode.HALF_EVEN).longValueExact())
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** `avg_iso_duration(microsCol)` as an untyped aggregate Column. */
  def avgDuration(microsCol: Column): Column =
    udaf(AvgDuration, Encoders.LONG).apply(microsCol.cast("long"))

  // ---- recipe difficulty classifier -------------------------------------

  /** Reference `determine_cooking_difficulty` (recipe_tasks.py:206-239):
    * total = cook + prep; < 30 min → easy, 30-60 inclusive → medium,
    * > 60 → hard, unparseable/null → unknown. Pure when/otherwise — the
    * reference's struct-returning Python UDF disappears entirely.
    */
  def difficulty(totalMicros: Column): Column = {
    val minutes = totalMicros / (60L * 1000000L)
    when(totalMicros.isNull, "unknown")
      .when(minutes < 30, "easy")
      .when(minutes <= 60, "medium")
      .otherwise("hard")
  }
}
