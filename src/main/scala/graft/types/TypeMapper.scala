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
  * Matching mirrors the reference exactly: substring (`includes`) tests
  * only for the keywords the reference substring-matches
  * (NVARCHAR/VARCHAR/CHAR, FLOAT/DOUBLE/REAL, DECIMAL/NUMERIC/MONEY,
  * DATETIME — index.js:41,45,46,49) and **exact equality** for the rest
  * (TEXT, INT/INTEGER/SMALLINT/BIGINT, TIMESTAMP, DATE, TIME, BIT,
  * BOOLEAN, UUID, JSONB — index.js:41,44,49-56), so inputs like INTERVAL
  * or POINT fall through to the TEXT fallback instead of being
  * mis-captured by an "INT" substring. Same total fallback: any
  * unrecognized string → StringType (index.js:58).
  */
object TypeMapper {

  /** Normalize a free-form type string to a Catalyst DataType. Total: never
    * throws; unknown inputs fall back to StringType.
    */
  def toDataType(raw: String): DataType = {
    val t = Option(raw).getOrElse("").trim.toUpperCase
    if (t.isEmpty) StringType
    // Text types first, same order as the reference (index.js:41):
    // substring for the VARCHAR/CHAR family, exact for TEXT.
    else if (has(t, "NVARCHAR", "VARCHAR", "CHAR") || is(t, "TEXT", "STRING")) StringType
    // INT family: exact equality only (index.js:44) — substring would
    // swallow INTERVAL/POINT/etc. BIGSERIAL/SERIAL/SMALLSERIAL are the
    // Smart-ID DDL names, accepted exactly as extensions.
    else if (is(t, "BIGINT", "BIGSERIAL")) LongType // deviation: kept 64-bit
    else if (is(t, "SMALLINT", "SMALLSERIAL")) ShortType // deviation: kept 16-bit
    else if (is(t, "TINYINT")) ByteType // extension (reference → TEXT)
    else if (is(t, "INT", "INTEGER", "SERIAL")) IntegerType
    else if (has(t, "DOUBLE", "REAL")) DoubleType // substring (index.js:45)
    else if (has(t, "FLOAT")) FloatType // substring (index.js:45)
    // Precision-bearing decimal keeps NUMERIC(18,2) scale (substring, index.js:46).
    else if (has(t, "DECIMAL", "NUMERIC", "MONEY")) parseDecimal(t)
    // DATETIME substring, TIMESTAMP exact (index.js:49).
    else if (has(t, "DATETIME") || is(t, "TIMESTAMP")) TimestampType
    else if (is(t, "DATE")) DateType
    // Reference maps TIME → PG TIME; Spark has no time-of-day type.
    // Documented choice (SURVEY.md §1.3): StringType preserving "HH:mm:ss".
    else if (is(t, "TIME")) StringType
    else if (is(t, "BIT", "BOOLEAN", "BOOL")) BooleanType
    else if (is(t, "BYTEA", "BINARY", "BLOB")) BinaryType // deviation: real binary
    else if (is(t, "UUID")) StringType // validated format, stored as text
    else if (is(t, "JSONB", "JSON")) StringType // JSONB → text + from_json downstream
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

  private def is(t: String, kws: String*): Boolean = kws.contains(t)

  private val DecimalArgs = """.*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\).*""".r

  private def parseDecimal(t: String): DecimalType = t match {
    case DecimalArgs(p, s) =>
      val prec = math.min(p.toInt, DecimalType.MAX_PRECISION)
      val scale = math.min(Option(s).map(_.toInt).getOrElse(0), prec)
      DecimalType(math.max(prec, 1), scale)
    case _ => DecimalType(18, 2) // MONEY / bare NUMERIC default
  }
}
