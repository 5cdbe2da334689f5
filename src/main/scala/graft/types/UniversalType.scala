package graft.types

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's 13-tag universal type system, re-expressed over Spark's
  * `DataType` lattice.
  *
  * Reference semantics (see `/root/reference/contract/contract.proto:26-43`,
  * `/root/reference/clickhouse/types/types.go:9-21`,
  * `/root/reference/mysql/types/types.go:9-14`):
  *   - tags: int8/16/32/64, uint8/16/32/64, float32/64, date, datetime, string
  *   - any unrecognized source type degrades to `string`
  *     (`clickhouse/types/types.go:44`, `mysql/types/types.go:37`)
  *   - datetimes are canonicalized to RFC3339 with optional millis
  *     (`contract/contract.proto:37`, layout `2006-01-02T15:04:05.999Z07:00`)
  *   - SQL NULL has no representation: it becomes the empty string
  *     (`mysql/mysql.go:109-112`)
  *
  * Spark has no unsigned integral types, so unsigned tags widen to the next
  * signed type that can hold the full range; `uint64` needs `Decimal(20,0)`.
  */
object UniversalType {

  /** Universal tag → Spark DataType. */
  val toSpark: Map[String, DataType] = Map(
    "int8"     -> ByteType,
    "int16"    -> ShortType,
    "int32"    -> IntegerType,
    "int64"    -> LongType,
    "uint8"    -> ShortType,          // widen: 0..255
    "uint16"   -> IntegerType,        // widen: 0..65535
    "uint32"   -> LongType,           // widen: 0..2^32-1
    "uint64"   -> DecimalType(20, 0), // full 0..2^64-1 range
    "float32"  -> FloatType,
    "float64"  -> DoubleType,
    "date"     -> DateType,
    "datetime" -> TimestampType,
    "string"   -> StringType,
  )

  /** Spark DataType → universal tag (inverse direction, used when we emit a
    * schema-carrying batch for an external consumer). Unknown → string, the
    * same fallback the reference applies on ingest.
    */
  def fromSpark(dt: DataType): String = dt match {
    case ByteType          => "int8"
    case ShortType         => "int16"
    case IntegerType       => "int32"
    case LongType          => "int64"
    case FloatType         => "float32"
    case DoubleType        => "float64"
    case DateType          => "date"
    case TimestampType     => "datetime"
    case d: DecimalType if d.scale == 0 && d.precision >= 20 => "uint64"
    case _                 => "string"
  }

  /** ClickHouse source-type name → universal tag
    * (`clickhouse/types/types.go:9-21`); unknown → string.
    */
  val fromClickHouse: Map[String, String] = Map(
    "Int8"  -> "int8",  "Int16"  -> "int16",  "Int32"  -> "int32",  "Int64"  -> "int64",
    "UInt8" -> "uint8", "UInt16" -> "uint16", "UInt32" -> "uint32", "UInt64" -> "uint64",
    "Date"  -> "date",  "DateTime" -> "datetime", "String" -> "string",
  )

  /** MySQL source-type name → universal tag (`mysql/types/types.go:9-14`);
    * unknown → string. Note the reference maps INT → int64 only and supports
    * no unsigned MySQL types (`mysql/writer/main_test.go:27`).
    */
  val fromMySql: Map[String, String] = Map(
    "INT"  -> "int64", "DATE" -> "date", "DATETIME" -> "datetime", "TEXT" -> "string",
  )

  /** `types.Update` semantics: rewrite a list of source-native type names into
    * universal tags with string fallback (`clickhouse/types/types.go:38-46`).
    */
  def update(dialect: Map[String, String], sourceTypes: Seq[String]): Seq[String] =
    sourceTypes.map(t => dialect.getOrElse(t, "string"))

  /** Source-format datetime (`2006-01-02 15:04:05`) → universal RFC3339 string
    * with millis only when non-zero, `Z` offset (session TZ is pinned UTC).
    * Mirrors `ToUniversal` for DateTime (`clickhouse/types/types.go:27-33`).
    */
  def toUniversalDatetime(c: Column): Column =
    formatRfc3339(to_timestamp(c, "yyyy-MM-dd HH:mm:ss"))

  /** Timestamp column → the reference's canonical RFC3339 encoding: Go layout
    * `2006-01-02T15:04:05.999Z07:00` — fractional seconds are printed only
    * when non-zero and with trailing zeros trimmed.
    */
  def formatRfc3339(ts: Column): Column = {
    val base   = date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
    val millis = date_format(ts, "SSS") // zero-padded 3 digits
    val frac = when(millis === "000", lit(""))
      .otherwise(concat(lit("."), regexp_replace(millis, "0+$", "")))
    concat(base, frac, lit("Z"))
  }

  /** Universal RFC3339 string → sink-format datetime `2006-01-02 15:04:05`
    * (mirrors `FromUniversal`, `clickhouse/types/types.go:54-57`).
    */
  def fromUniversalDatetime(c: Column): Column =
    date_format(to_timestamp(c), "yyyy-MM-dd HH:mm:ss")

  /** Normalize a dynamically-inferred DataFrame to the universal system:
    * every column whose Spark type has no universal tag is cast to string
    * (the reference's unknown-type fallback), everything else kept native.
    * Keeping native types is strictly better than the reference's
    * stringly-typed cells; `stringlyBatch` below provides the byte-exact
    * compat encoding when needed.
    */
  def normalize(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val tag = fromSpark(f.dataType)
      if (tag == "string" && f.dataType != StringType) col(f.name).cast(StringType).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Compat encoding of one column as the reference's universal cell string:
    * NULL → "", datetime → RFC3339-with-optional-millis, date → yyyy-MM-dd,
    * everything else its decimal/raw string form.
    */
  def universalCell(c: Column, dt: DataType): Column = {
    val s = dt match {
      case TimestampType => formatRfc3339(c)
      case DateType      => date_format(c, "yyyy-MM-dd")
      case _             => c.cast(StringType)
    }
    coalesce(s, lit(""))
  }

  /** Whole-row compat encoding: every cell as universal string, NULL → "". */
  def stringlyBatch(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map(f => universalCell(col(f.name), f.dataType).as(f.name))
    df.select(cols.toIndexedSeq: _*)
  }
}
