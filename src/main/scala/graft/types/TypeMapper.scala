package graft.types

import org.apache.spark.sql.types._

/** Free-form SQL type-string → Catalyst [[DataType]] normalizer.
  *
  * Re-expresses the reference's `mapToPostgresType`
  * (reference backend/index.js:35-59): a pure keyword-matching translator
  * that turns whatever the user typed in the type modal into a canonical
  * type. The reference targets PostgreSQL type names; we target Catalyst
  * types. Two deliberate fidelity deviations (documented in SURVEY.md §1.3):
  *
  *   - the reference lossily collapses BIGINT/SMALLINT → INTEGER
  *     (index.js:44); we keep LongType / ShortType distinct.
  *   - the reference maps BYTEA via the TEXT fallback (index.js:58);
  *     we map it to BinaryType (a multimodal pipeline needs real binary).
  *
  * Matching is case-insensitive substring/keyword matching, same shape as
  * the reference, with the same total fallback: any unrecognized string →
  * StringType (index.js:58).
  */
object TypeMapper {

  /** Normalize a free-form type string to a Catalyst DataType. Total: never
    * throws; unknown inputs fall back to StringType.
    */
  def toDataType(raw: String): DataType = {
    val t = Option(raw).getOrElse("").trim.toUpperCase
    if (t.isEmpty) StringType
    // Precision-bearing decimal first so NUMERIC(18,2) keeps its scale.
    else if (has(t, "DECIMAL", "NUMERIC", "MONEY")) parseDecimal(t)
    else if (has(t, "BIGINT")) LongType // before INT substring match
    else if (has(t, "SMALLINT")) ShortType // before INT substring match
    else if (has(t, "TINYINT")) ByteType
    else if (has(t, "INTEGER", "INT", "SERIAL")) IntegerType
    else if (has(t, "DOUBLE", "REAL")) DoubleType
    else if (has(t, "FLOAT")) FloatType
    // TIMESTAMP/DATETIME before DATE/TIME (substring overlap).
    else if (has(t, "TIMESTAMP", "DATETIME")) TimestampType
    else if (has(t, "DATE")) DateType
    // Reference maps TIME → PG TIME; Spark has no time-of-day type.
    // Documented choice (SURVEY.md §1.3): StringType preserving "HH:mm:ss".
    else if (has(t, "TIME")) StringType
    else if (has(t, "BIT", "BOOL")) BooleanType
    else if (has(t, "BYTEA", "BINARY", "BLOB")) BinaryType
    else if (has(t, "UUID")) StringType // validated format, stored as text
    else if (has(t, "JSON")) StringType // JSONB → text + from_json downstream
    else if (has(t, "VARCHAR", "NVARCHAR", "CHAR", "TEXT", "STRING")) StringType
    else StringType // total fallback, same behavior as index.js:58
  }

  /** The canonical SQL name for a normalized type — the analogue of the
    * reference's output (a PG type string), useful for JDBC DDL.
    */
  def toSqlName(dt: DataType): String = dt match {
    case StringType => "TEXT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case ShortType => "SMALLINT"
    case ByteType => "SMALLINT"
    case DoubleType => "DOUBLE PRECISION"
    case FloatType => "REAL"
    case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case BooleanType => "BOOLEAN"
    case BinaryType => "BYTEA"
    case other => other.sql
  }

  private def has(t: String, kws: String*): Boolean = kws.exists(t.contains)

  private val DecimalArgs = """.*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\).*""".r

  private def parseDecimal(t: String): DecimalType = t match {
    case DecimalArgs(p, s) =>
      val prec = math.min(p.toInt, DecimalType.MAX_PRECISION)
      val scale = math.min(Option(s).map(_.toInt).getOrElse(0), prec)
      DecimalType(math.max(prec, 1), scale)
    case _ => DecimalType(18, 2) // MONEY / bare NUMERIC default
  }
}
