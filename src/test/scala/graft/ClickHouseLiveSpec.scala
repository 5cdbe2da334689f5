package graft

import java.sql.DriverManager

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.{Transfer, Window}
import graft.sources.{FileConnector, JdbcConnector}

/** LIVE ClickHouse integration round-trip — the reference's S3/K1
  * surface against a real server (its CI stands up ClickHouse via
  * docker-compose and exercises HTTP insert/select,
  * `/root/reference/docker-compose.yml:17-42`,
  * `clickhouse/clickhouse.go:29-80`; this repo's compose file declares
  * the same service on 8123).
  *
  * Gated, not assumed: set `GRAFT_CLICKHOUSE_URL` (e.g.
  * `jdbc:clickhouse://127.0.0.1:8123/default`) with a ClickHouse JDBC
  * driver on the classpath and a reachable daemon; otherwise every test
  * CANCELS (suite stays green) — the same shape as [[MySqlLiveSpec]].
  * The dialect's type table is spec-tested hermetically in
  * `ClickHouseDialectSpec`; what ONLY a live server can prove is that
  * the driver-reported type names (`Nullable(UInt32)`,
  * `LowCardinality(String)`, `DateTime('UTC')`, …) actually flow
  * through `getCatalystType`, that the unsigned widenings hold real
  * extreme values, and that the write-side DDL (dialect type names +
  * the MergeTree engine clause) is accepted by the server.
  */
class ClickHouseLiveSpec extends SparkSpec {

  private val urlOpt = sys.env.get("GRAFT_CLICKHOUSE_URL")

  /** Cancel unless a live, drivered, reachable ClickHouse is configured. */
  private def requireLive(): String = {
    val url = urlOpt.getOrElse(
      cancel("GRAFT_CLICKHOUSE_URL not set — live ClickHouse round-trip skipped"))
    val driverPresent = Seq(
      "com.clickhouse.jdbc.ClickHouseDriver",      // clickhouse-jdbc ≥ 0.4
      "ru.yandex.clickhouse.ClickHouseDriver")     // legacy driver
      .exists(c => scala.util.Try(Class.forName(c)).isSuccess)
    if (!driverPresent)
      cancel("no ClickHouse JDBC driver on the classpath")
    try DriverManager.getConnection(url).close()
    catch { case e: Exception => cancel(s"ClickHouse not reachable: ${e.getMessage}") }
    url
  }

  private def exec(url: String, sql: String*): Unit = {
    val c = DriverManager.getConnection(url)
    try sql.foreach { s => val st = c.createStatement(); try st.execute(s) finally st.close() }
    finally c.close()
  }

  test("live ClickHouse: full dialect type table over a real scan") {
    val url = requireLive()
    // The reference's ClickHouse type surface (clickhouse/types/types.go:9-62)
    // plus the wrapper forms the dialect must unwrap.
    exec(url,
      "DROP TABLE IF EXISTS graft_ch_types",
      """CREATE TABLE graft_ch_types (
        |  id Int64, i8 Int8, i16 Int16, i32 Int32,
        |  u8 UInt8, u16 UInt16, u32 UInt32, u64 UInt64,
        |  f32 Float32, f64 Float64, dec Decimal(18, 4),
        |  d Date, dt DateTime('UTC'),
        |  s String, fs FixedString(8), lc LowCardinality(String),
        |  nu Nullable(UInt32), arr Array(Int64),
        |  e8 Enum8('alpha' = 1, 'beta' = 2)
        |) ENGINE = MergeTree ORDER BY id""".stripMargin,
      """INSERT INTO graft_ch_types VALUES
        |  (1, -128, -32768, -2147483648,
        |   255, 65535, 4294967295, 18446744073709551615,
        |   1.5, -2.5, 12345.6789,
        |   '2024-01-01', '2024-06-30 23:59:59',
        |   'plain', 'eight_ch', 'low-card',
        |   4294967295, [1, 2, 3], 'alpha'),
        |  (2, 127, 32767, 2147483647,
        |   0, 0, 0, 0,
        |   -1.5, 2.5, -0.0001,
        |   '1970-01-01', '1970-01-01 00:00:01',
        |   '', 'zzzzzzzz', '',
        |   NULL, [], 'beta')""".stripMargin)

    val df = new JdbcConnector(spark, url).read("graft_ch_types")
    val bt = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // Signed types map 1:1 …
    assert(bt("i8") == ByteType && bt("i16") == ShortType &&
      bt("i32") == IntegerType && bt("id") == LongType)
    // … unsigned types WIDEN (UIntN does not fit IntN) …
    assert(bt("u8") == ShortType, s"UInt8 should widen to Short, got ${bt("u8")}")
    assert(bt("u16") == IntegerType && bt("u32") == LongType)
    assert(bt("u64").isInstanceOf[DecimalType])
    // … wrappers unwrap to their base mapping …
    assert(bt("nu") == LongType, s"Nullable(UInt32) should unwrap, got ${bt("nu")}")
    assert(bt("lc") == StringType && bt("fs") == StringType && bt("e8") == StringType)
    assert(bt("arr") == ArrayType(LongType) ||
      bt("arr") == ArrayType(LongType, containsNull = false))
    // … and temporals/floats land on their Catalyst homes.
    assert(bt("d") == DateType && bt("dt") == TimestampType)
    assert(bt("f32") == FloatType && bt("f64") == DoubleType)

    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    val r1 = rows(0)
    // The unsigned extremes survive the widening end to end.
    assert(r1.getAs[Short]("u8") == 255)
    assert(r1.getAs[Int]("u16") == 65535)
    assert(r1.getAs[Long]("u32") == 4294967295L)
    assert(r1.getAs[java.math.BigDecimal]("u64").toBigInteger ==
      new java.math.BigInteger("18446744073709551615"))
    assert(r1.getAs[java.math.BigDecimal]("dec").doubleValue() == 12345.6789)
    assert(r1.getAs[Seq[Long]]("arr") == Seq(1L, 2L, 3L))
    assert(r1.getAs[String]("e8") == "alpha")
    assert(rows(1).isNullAt(rows(1).fieldIndex("nu"))) // NULL survives Nullable()
    exec(url, "DROP TABLE IF EXISTS graft_ch_types")
  }

  test("live ClickHouse: write-side DDL (dialect names + engine clause) and read-back") {
    val url = requireLive()
    exec(url, "DROP TABLE IF EXISTS graft_ch_out")
    val out = spark.range(1, 101)
      .select(col("id"), (col("id") % 7).cast("int").as("grp"),
        concat(lit("v"), col("id")).as("s"),
        (col("id") % 2 === 0).as("even"))
    // Overwrite forces the connector's CREATE TABLE path: dialect type
    // names + the default `ENGINE = MergeTree ORDER BY tuple()` clause
    // (without which ClickHouse rejects the DDL outright).
    val jdbc = new JdbcConnector(spark, url, batchSize = 32)
    jdbc.write(out, "graft_ch_out", SaveMode.Overwrite)
    // The created column types are the dialect's, not a driver guess.
    val created = jdbc.readQuery(
      """SELECT name, type FROM system.columns
        |WHERE table = 'graft_ch_out' AND database = currentDatabase()""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(created("id") == "Int64" && created("grp") == "Int32")
    assert(created("s") == "String")
    assert(created("even") == "UInt8" || created("even") == "Bool")
    val back = jdbc.read("graft_ch_out")
    assert(back.count() == 100)
    assert(back.agg(sum("grp")).head.getLong(0) ==
      out.agg(sum("grp")).head.getLong(0))
    exec(url, "DROP TABLE IF EXISTS graft_ch_out")
  }

  test("live ClickHouse: full transfer pipeline with incremental dedup") {
    val url = requireLive()
    val events = graft.sources.Tables.load(spark, sf0001, "events")
      .select("event_id", "user_id", "event_type", "value")
    val jdbc = new JdbcConnector(spark, url)
    jdbc.write(events, "graft_ch_events_src", SaveMode.Overwrite)

    val tmp = java.nio.file.Files.createTempDirectory("graft-ch-out").toString
    val sink = new FileConnector(spark, tmp)
    val cfg = Transfer.Config(table = "graft_ch_events_src", target = "out",
      window = Some(Window("user_id", "0", "25")), increment = true)
    val r1 = Transfer.run(jdbc, sink, cfg)
    assert(r1.rowsWritten > 0 && r1.rowsFiltered == 0)
    val r2 = Transfer.run(jdbc, sink, cfg) // second run: full dedup
    assert(r2.rowsWritten == 0 && r2.rowsFiltered == r2.rowsRead)
    exec(url, "DROP TABLE IF EXISTS graft_ch_events_src")
  }
}
