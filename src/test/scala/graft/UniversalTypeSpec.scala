package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.types.UniversalType

/** Type-mapping tables from the reference (FIXTURES.md A2/A3). */
class UniversalTypeSpec extends SparkSpec {
  import spark.implicits._

  test("ClickHouse type names → universal tags, unknown → string") {
    // clickhouse/types/types_test.go:56-86
    val in = Seq("DateTime", "UInt8", "UInt16", "UInt32", "UInt64",
      "Int8", "Int16", "Int32", "Int64", "Date", "String", "AnyNotSupportType")
    val want = Seq("datetime", "uint8", "uint16", "uint32", "uint64",
      "int8", "int16", "int32", "int64", "date", "string", "string")
    assert(UniversalType.update(UniversalType.fromClickHouse, in) == want)
  }

  test("MySQL type names → universal tags, unknown → string") {
    // mysql/types/types_test.go:47-63
    val in = Seq("DATETIME", "INT", "DATE", "TEXT", "AnyNotSupportType")
    val want = Seq("datetime", "int64", "date", "string", "string")
    assert(UniversalType.update(UniversalType.fromMySql, in) == want)
  }

  test("universal tag → Spark DataType incl. unsigned widening") {
    assert(UniversalType.toSpark("int64") == LongType)
    assert(UniversalType.toSpark("uint32") == LongType)
    assert(UniversalType.toSpark("uint64") == DecimalType(20, 0))
    assert(UniversalType.toSpark("datetime") == TimestampType)
  }

  test("datetime source → RFC3339 with no millis when zero (FIXTURES A2)") {
    val got = Seq("2022-06-19 19:54:01", "2022-06-19 19:54:02").toDF("c")
      .select(UniversalType.toUniversalDatetime($"c").as("u"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("2022-06-19T19:54:01Z", "2022-06-19T19:54:02Z"))
  }

  test("datetime keeps trimmed millis when non-zero") {
    val got = Seq("2022-06-19 19:54:01.250", "2022-06-19 19:54:01.999")
      .toDF("c")
      .select(UniversalType.formatRfc3339(to_timestamp($"c").as("t")).as("u"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("2022-06-19T19:54:01.25Z", "2022-06-19T19:54:01.999Z"))
  }

  test("round trip back to sink format") {
    val got = Seq("2022-06-19T10:00:12Z").toDF("c")
      .select(UniversalType.fromUniversalDatetime($"c").as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("2022-06-19 10:00:12")) // mysql/types/types_test.go:83-87
  }

  test("unparseable datetime fails the batch (reference hard-errors)") {
    // The reference aborts the whole batch on a bad datetime
    // (`mysql/mysql_test.go:32-38`); Spark 4's ANSI to_timestamp gives the
    // same hard-error semantics.
    intercept[Exception] {
      Seq("fgegdgfbsfg").toDF("c")
        .select(UniversalType.toUniversalDatetime($"c").as("u"))
        .collect()
    }
  }
}
