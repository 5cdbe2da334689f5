package graft.sources

import java.sql.Types
import java.util.Locale

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** S3: ClickHouse `JdbcDialect` — Spark-native expression of the
  * reference's ClickHouse type dictionary
  * (`clickhouse/types/types.go:9-21`): the 11 supported source types map
  * to Catalyst types with unsigned WIDENING (a `UIntN` value does not fit
  * `IntN`, so each unsigned type promotes to the next wider signed type,
  * `UInt64` to `Decimal(20,0)` — same widening as
  * `UniversalType.fromClickHouse`), and every unrecognized type falls
  * back to STRING exactly like the reference's `types.Update`
  * (`clickhouse/types/types.go:38-46`).
  *
  * ClickHouse wraps types — `Nullable(UInt32)`, `LowCardinality(String)`,
  * `DateTime('UTC')`, `Decimal(18, 4)`, `Array(Int64)` — so the mapping
  * first unwraps modifiers, then resolves the base name; `Array(T)` maps
  * to `ArrayType` of the element mapping.
  *
  * The dialect registers once per JVM via `ClickHouseDialect.register()`
  * (idempotent); `JdbcConnector` calls it automatically for
  * `jdbc:clickhouse:` URLs, after which Spark's JDBC source uses it for
  * both schema discovery (reads) and DDL type names (writes). There is no
  * ClickHouse server or driver jar in this sandbox, so the dialect's
  * contract is spec-tested directly (`ClickHouseDialectSpec` mirrors
  * `clickhouse/types/types_test.go:47-93`); against a real cluster the
  * same methods are invoked by Spark's `JDBCRDD`/`JdbcUtils`.
  */
object ClickHouseDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(Locale.ROOT).startsWith("jdbc:clickhouse")

  /** Strip ClickHouse type modifiers down to the base type name:
    * `Nullable(X)` / `LowCardinality(X)` unwrap recursively;
    * parameterized scalars keep their head (`DateTime('UTC')` →
    * `DateTime`, `Decimal(18, 4)` → `Decimal`); `Array(X)` is preserved
    * for the caller to recurse on its element.
    */
  private[sources] def baseName(typeName: String): String = {
    val t = typeName.trim
    if (t.startsWith("Nullable(") && t.endsWith(")"))
      baseName(t.stripPrefix("Nullable(").stripSuffix(")"))
    else if (t.startsWith("LowCardinality(") && t.endsWith(")"))
      baseName(t.stripPrefix("LowCardinality(").stripSuffix(")"))
    else if (t.startsWith("Array(")) t
    else t.indexOf('(') match {
      case -1 => t
      case i  => t.substring(0, i)
    }
  }

  /** ClickHouse type name → Catalyst type; None never escapes (unknown →
    * StringType, the reference's fallback).
    */
  private[sources] def toCatalyst(typeName: String): DataType = {
    val t = baseName(typeName)
    if (t.startsWith("Array(") && t.endsWith(")"))
      ArrayType(toCatalyst(t.stripPrefix("Array(").stripSuffix(")")))
    else t match {
      case "Int8"       => ByteType
      case "Int16"      => ShortType
      case "Int32"      => IntegerType
      case "Int64"      => LongType
      case "UInt8"      => ShortType            // 0..255 exceeds Int8
      case "UInt16"     => IntegerType          // 0..65535 exceeds Int16
      case "UInt32"     => LongType             // exceeds Int32
      case "UInt64"     => DecimalType(20, 0)   // exceeds Int64
      case "Float32"    => FloatType
      case "Float64"    => DoubleType
      case "Decimal"    => DecimalType.SYSTEM_DEFAULT
      case "Date" | "Date32" => DateType
      case "DateTime" | "DateTime64" => TimestampType
      case "String" | "FixedString" | "UUID" | "Enum8" | "Enum16" => StringType
      case "Bool"       => BooleanType
      case _            => StringType           // types.Update fallback
    }
  }

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] =
    Option(typeName).filter(_.nonEmpty).map(toCatalyst)

  /** Catalyst type → ClickHouse DDL type for CREATE/INSERT on write —
    * inverse of the table above (signed names: the reference writes only
    * signed/string/date types, `mysql/writer` analog).
    */
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case ByteType       => Some(JdbcType("Int8", Types.TINYINT))
    case ShortType      => Some(JdbcType("Int16", Types.SMALLINT))
    case IntegerType    => Some(JdbcType("Int32", Types.INTEGER))
    case LongType       => Some(JdbcType("Int64", Types.BIGINT))
    case FloatType      => Some(JdbcType("Float32", Types.FLOAT))
    case DoubleType     => Some(JdbcType("Float64", Types.DOUBLE))
    case StringType     => Some(JdbcType("String", Types.VARCHAR))
    case BooleanType    => Some(JdbcType("UInt8", Types.BOOLEAN))
    case DateType       => Some(JdbcType("Date", Types.DATE))
    case TimestampType  => Some(JdbcType("DateTime", Types.TIMESTAMP))
    case d: DecimalType if d.precision == 20 && d.scale == 0 =>
      Some(JdbcType("UInt64", Types.DECIMAL))
    case d: DecimalType =>
      Some(JdbcType(s"Decimal(${d.precision}, ${d.scale})", Types.DECIMAL))
    case ArrayType(et, _) =>
      getJDBCType(et).map(j => JdbcType(s"Array(${j.databaseTypeDefinition})", Types.ARRAY))
    case _ => None
  }

  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  @volatile private var registered = false

  /** Idempotent JVM-wide registration with Spark's dialect registry. */
  def register(): Unit = synchronized {
    if (!registered) {
      JdbcDialects.registerDialect(this)
      registered = true
    }
  }
}
