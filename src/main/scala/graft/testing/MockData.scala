package graft.testing

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic mock-data generation over arbitrary Spark schemas — the
  * finished form of the reference's half-built property scaffold
  * (reference: src/com/vitthalmirji/utils/MockupData.py:25-117, whose
  * `forType` was never implemented). Same biased-generation philosophy:
  * "interesting" values (empty strings, zeros, min/max, unicode,
  * whitespace) are drawn with probability `pInteresting`, nulls with
  * `pNull`, sizes capped (`maxStr`, `maxColl`).
  *
  * Everything is seeded — a failing property reproduces from its seed.
  * Used by ScalaCheck suites (see PropertySpec) and usable standalone to
  * fuzz any operator that takes a DataFrame.
  */
object MockData {

  final case class GenConfig(pNull: Double = 0.1, pInteresting: Double = 0.5,
                             maxStr: Int = 64, maxColl: Int = 8,
                             maxDepth: Int = 3)

  private val interestingStrings = Seq(
    "", " ", "  leading", "trailing  ", "null", "0", "-1",
    "line\nbreak", "tab\tchar", "ünïcødé-日本語", "a;b;c", "~", "'quoted'")
  private val interestingLongs = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue + 1)
  private val interestingDoubles = Seq(0.0, -0.0, 1.0, -1.0, 1e-300, 1e300)

  /** A random (but seeded) schema of `nCols` columns drawn from the engine's
    * supported type surface, nesting structs/arrays/maps to `maxDepth`. */
  def genSchema(rnd: Random, nCols: Int, cfg: GenConfig = GenConfig()): StructType =
    StructType((0 until nCols).map(i =>
      StructField(s"c$i", genType(rnd, cfg.maxDepth, cfg), nullable = true)))

  private def genType(rnd: Random, depth: Int, cfg: GenConfig): DataType = {
    val scalars = Seq(IntegerType, LongType, DoubleType, FloatType, BooleanType,
      StringType, DateType, TimestampType, BinaryType, DecimalType(18, 2))
    if (depth <= 0 || rnd.nextDouble() < 0.7) scalars(rnd.nextInt(scalars.length))
    else rnd.nextInt(3) match {
      case 0 => ArrayType(genType(rnd, depth - 1, cfg))
      case 1 => StructType((0 until 1 + rnd.nextInt(3)).map(i =>
        StructField(s"f$i", genType(rnd, depth - 1, cfg))))
      case _ => MapType(StringType, genType(rnd, depth - 1, cfg))
    }
  }

  /** One random value of `dt` (null with pNull, interesting with
    * pInteresting — mirroring MockupData.py:28-35 biases). */
  def genValue(rnd: Random, dt: DataType, cfg: GenConfig = GenConfig()): Any = {
    if (rnd.nextDouble() < cfg.pNull) return null
    val interesting = rnd.nextDouble() < cfg.pInteresting
    dt match {
      case StringType =>
        if (interesting) interestingStrings(rnd.nextInt(interestingStrings.length))
        else rnd.alphanumeric.take(1 + rnd.nextInt(cfg.maxStr)).mkString
      case IntegerType =>
        if (interesting) interestingLongs(rnd.nextInt(interestingLongs.length)).toInt
        else rnd.nextInt()
      case LongType =>
        if (interesting) interestingLongs(rnd.nextInt(interestingLongs.length))
        else rnd.nextLong()
      case DoubleType =>
        if (interesting) interestingDoubles(rnd.nextInt(interestingDoubles.length))
        else rnd.nextDouble() * 1e6 - 5e5
      case FloatType => genValue(rnd, DoubleType, cfg.copy(pNull = 0)) match {
        case d: Double => d.toFloat
        case x => x
      }
      case BooleanType => rnd.nextBoolean()
      case DateType => java.sql.Date.valueOf(
        java.time.LocalDate.of(1970 + rnd.nextInt(80), 1 + rnd.nextInt(12), 1 + rnd.nextInt(28)))
      case TimestampType => new java.sql.Timestamp(math.abs(rnd.nextLong()) % 4102444800000L)
      case BinaryType => { val b = new Array[Byte](rnd.nextInt(16)); rnd.nextBytes(b); b }
      case d: DecimalType =>
        BigDecimal(rnd.nextInt(1000000)).bigDecimal.movePointLeft(d.scale)
      // Nested nullability is honored the same way genDataFrame honors the
      // top level: containsNull=false elements, valueContainsNull=false map
      // values, and non-nullable struct fields never draw null — Spark
      // codegen trusts declared nullability, so injecting nulls there makes
      // the fuzzer report phantom bugs (getLong on a null slot) instead of
      // real ones.
      case ArrayType(et, containsNull) =>
        Seq.fill(rnd.nextInt(cfg.maxColl))(
          genValue(rnd, et, if (containsNull) cfg else cfg.copy(pNull = 0)))
      case MapType(kt, vt, valueContainsNull) =>
        Seq.fill(rnd.nextInt(cfg.maxColl))(
          (genValue(rnd, kt, cfg.copy(pNull = 0)),
            genValue(rnd, vt, if (valueContainsNull) cfg else cfg.copy(pNull = 0)))).toMap
      case st: StructType =>
        Row.fromSeq(st.fields.toSeq.map(f =>
          genValue(rnd, f.dataType, if (f.nullable) cfg else cfg.copy(pNull = 0))))
      case other => throw new IllegalArgumentException(s"no generator for $other")
    }
  }

  /** A seeded DataFrame of `nRows` rows of `schema`. */
  def genDataFrame(spark: SparkSession, seed: Long, schema: StructType,
                   nRows: Int, cfg: GenConfig = GenConfig()): DataFrame = {
    val rnd = new Random(seed)
    val rows = (0 until nRows).map(_ =>
      Row.fromSeq(schema.fields.toSeq.map(f =>
        genValue(rnd, f.dataType, if (f.nullable) cfg else cfg.copy(pNull = 0.0)))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, math.min(4, nRows))), schema)
  }
}
