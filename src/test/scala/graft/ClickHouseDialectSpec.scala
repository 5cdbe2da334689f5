package graft

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ClickHouseDialect

/** Mirrors `/root/reference/clickhouse/types/types_test.go:47-93`
  * (`TestUpdate`: every supported ClickHouse type maps, unknown falls
  * back to string) against the Spark dialect, plus the widening and
  * wrapper-unwrapping rules the JDBC surface needs.
  */
class ClickHouseDialectSpec extends AnyFunSuite {

  private def cat(name: String): DataType =
    ClickHouseDialect.getCatalystType(0, name, 0, new MetadataBuilder).get

  test("the reference's full type table maps (types_test.go TestUpdate)") {
    // reference order: DateTime, UInt8..64, Int8..64, Date, String, unknown
    assert(cat("DateTime") == TimestampType)
    assert(cat("UInt8") == ShortType)
    assert(cat("UInt16") == IntegerType)
    assert(cat("UInt32") == LongType)
    assert(cat("UInt64") == DecimalType(20, 0))
    assert(cat("Int8") == ByteType)
    assert(cat("Int16") == ShortType)
    assert(cat("Int32") == IntegerType)
    assert(cat("Int64") == LongType)
    assert(cat("Date") == DateType)
    assert(cat("String") == StringType)
    assert(cat("AnyNotSupportType") == StringType) // types.Update fallback
  }

  test("unsigned widening: every UIntN fits its mapped type's range") {
    // UInt8 max 255 needs > Int8; UInt16 max 65535 > Int16; etc.
    assert(cat("UInt8") != ByteType && cat("UInt16") != ShortType &&
      cat("UInt32") != IntegerType && cat("UInt64") != LongType)
  }

  test("wrapper types unwrap: Nullable, LowCardinality, parameters") {
    assert(cat("Nullable(UInt32)") == LongType)
    assert(cat("LowCardinality(String)") == StringType)
    assert(cat("Nullable(LowCardinality(String))") == StringType)
    assert(cat("DateTime('UTC')") == TimestampType)
    assert(cat("DateTime64(3, 'UTC')") == TimestampType)
    assert(cat("FixedString(16)") == StringType)
    assert(cat("Array(Int64)") == ArrayType(LongType))
    assert(cat("Array(Nullable(String))") == ArrayType(StringType))
  }

  test("write-side DDL names round-trip the read-side mapping") {
    def ddl(dt: DataType): String =
      ClickHouseDialect.getJDBCType(dt).get.databaseTypeDefinition
    assert(ddl(LongType) == "Int64")
    assert(ddl(StringType) == "String")
    assert(ddl(TimestampType) == "DateTime")
    assert(ddl(DateType) == "Date")
    assert(ddl(DecimalType(20, 0)) == "UInt64") // uint64 survives a round trip
    assert(ddl(ArrayType(IntegerType)) == "Array(Int32)")
    // read(write(T)) is identity for the reference's table
    for (t <- Seq(ByteType, ShortType, IntegerType, LongType, FloatType,
        DoubleType, StringType, DateType, TimestampType))
      assert(cat(ddl(t)) == t, s"round trip of $t")
  }

  test("registration: dialect resolves for clickhouse URLs only") {
    ClickHouseDialect.register()
    ClickHouseDialect.register() // idempotent
    assert(JdbcDialects.get("jdbc:clickhouse://host:8123/db") eq ClickHouseDialect)
    assert(!(JdbcDialects.get("jdbc:mysql://host/db") eq ClickHouseDialect))
  }

  test("identifier quoting uses backticks (ClickHouse syntax)") {
    assert(ClickHouseDialect.quoteIdentifier("a`b") == "`a``b`")
  }
}
