package graft

import java.sql.DriverManager

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.pipeline.{Transfer, Window}
import graft.sources.{FileConnector, JdbcConnector}

/** LIVE MySQL integration round-trip — the reference's S2/K2 surface
  * against a real server (its CI stands up MySQL+ClickHouse via
  * docker-compose; see this repo's docker-compose.yml for the same).
  *
  * Gated, not assumed: set `GRAFT_MYSQL_URL` (e.g.
  * `jdbc:mysql://127.0.0.1:3306/test?user=root&password=root`) with a
  * MySQL JDBC driver on the classpath and a reachable daemon; otherwise
  * every test CANCELS (reported as canceled, suite stays green) — the
  * standard shape for daemon-dependent specs in a hermetic sandbox.
  * Embedded-Derby coverage of the same code path lives in
  * JdbcConnectorSpec and always runs.
  */
class MySqlLiveSpec extends SparkSpec {

  private val urlOpt = sys.env.get("GRAFT_MYSQL_URL")

  /** Cancel unless a live, drivered, reachable MySQL is configured. */
  private def requireLive(): String = {
    val url = urlOpt.getOrElse(
      cancel("GRAFT_MYSQL_URL not set — live MySQL round-trip skipped"))
    val driverPresent = Seq("com.mysql.cj.jdbc.Driver", "org.mariadb.jdbc.Driver")
      .exists(c => scala.util.Try(Class.forName(c)).isSuccess)
    if (!driverPresent)
      cancel("no MySQL/MariaDB JDBC driver on the classpath")
    try DriverManager.getConnection(url).close()
    catch { case e: Exception => cancel(s"MySQL not reachable: ${e.getMessage}") }
    url
  }

  private def exec(url: String, sql: String*): Unit = {
    val c = DriverManager.getConnection(url)
    try sql.foreach { s => val st = c.createStatement(); try st.execute(s) finally st.close() }
    finally c.close()
  }

  test("live MySQL: type-mapped scan, partitioned read, batched write round-trip") {
    val url = requireLive()
    // The reference's MySQL type surface (mysql/types/types.go): integer
    // widths, decimal, double, varchar/text, date/datetime.
    exec(url,
      "DROP TABLE IF EXISTS graft_types",
      """CREATE TABLE graft_types (
        |  id BIGINT PRIMARY KEY, ti TINYINT, si SMALLINT, i INT,
        |  dec9 DECIMAL(9,2), d DOUBLE, vc VARCHAR(64), tx TEXT,
        |  dt DATE, dtt DATETIME(6))""".stripMargin,
      """INSERT INTO graft_types VALUES
        |  (1, 1, 100, 100000, 12345.67, 1.5, 'alpha', 'long text a',
        |   '2024-01-01', '2024-01-01 12:34:56.789'),
        |  (2, -1, -100, -100000, -0.01, -2.5, 'beta', 'long text b',
        |   '2024-06-30', '2024-06-30 23:59:59.999999'),
        |  (3, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL)""".stripMargin)

    val jdbc = new JdbcConnector(spark, url, batchSize = 2,
      numPartitions = 3, partitionColumn = Some("id"),
      lowerBound = Some("1"), upperBound = Some("4"))
    val df = jdbc.read("graft_types")
    assert(df.rdd.getNumPartitions == 3)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[java.math.BigDecimal]("dec9").doubleValue() == 12345.67)
    assert(rows(1).getAs[String]("vc") == "beta")
    assert(rows(2).isNullAt(rows(2).fieldIndex("tx"))) // NULLs survive

    // Batched write of a Spark frame, then read-back equality.
    val out = spark.range(1, 101)
      .select(col("id"), (col("id") % 7).cast("int").as("grp"),
        concat(lit("v"), col("id")).as("s"))
    jdbc.write(out, "graft_out", SaveMode.Overwrite)
    val back = new JdbcConnector(spark, url).read("graft_out")
    assert(back.count() == 100)
    assert(back.agg(sum("grp")).head.getLong(0) ==
      out.agg(sum("grp")).head.getLong(0))
    exec(url, "DROP TABLE IF EXISTS graft_types",
      "DROP TABLE IF EXISTS graft_out")
  }

  test("live MySQL: full transfer pipeline with incremental dedup") {
    val url = requireLive()
    val events = graft.sources.Tables.load(spark, sf0001, "events")
      .select("event_id", "user_id", "event_type", "value")
    val jdbc = new JdbcConnector(spark, url)
    jdbc.write(events, "graft_events_src", SaveMode.Overwrite)

    val tmp = java.nio.file.Files.createTempDirectory("graft-mysql-out").toString
    val sink = new FileConnector(spark, tmp)
    val cfg = Transfer.Config(table = "graft_events_src", target = "out",
      window = Some(Window("user_id", "0", "25")), increment = true)
    val r1 = Transfer.run(jdbc, sink, cfg)
    assert(r1.rowsWritten > 0 && r1.rowsFiltered == 0)
    val r2 = Transfer.run(jdbc, sink, cfg) // second run: full dedup
    assert(r2.rowsWritten == 0 && r2.rowsFiltered == r2.rowsRead)
    exec(url, "DROP TABLE IF EXISTS graft_events_src")
  }
}
