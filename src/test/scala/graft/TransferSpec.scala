package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import graft.pipeline.{Transfer, Window}
import graft.sources.FileConnector

/** M1 end-to-end: the full reference pipeline semantics (scan → project →
  * window → dedup → sink → accounting) on driver fixture data — mirrors the
  * provider/consumer mock scenarios (`provider_test.go`, `consumer_test.go`).
  */
class TransferSpec extends SparkSpec {

  test("full transfer then incremental re-run writes zero new rows") {
    val tmp = Files.createTempDirectory("graft-transfer").toString
    val src = new FileConnector(spark, sf0001)
    val sink = new FileConnector(spark, tmp)
    val cfg = Transfer.Config(
      table = "events", target = "events_out",
      fields = Seq("event_id", "user_id", "event_type", "value"),
      window = Some(Window("user_id", "0", "25")),
      increment = true)

    val first = Transfer.run(src, sink, cfg)
    assert(first.rowsWritten > 0)
    assert(first.rowsRead == first.rowsWritten) // empty target: nothing filtered

    val second = Transfer.run(src, sink, cfg)
    assert(second.rowsRead == first.rowsRead)
    assert(second.rowsWritten == 0)             // everything deduped
    assert(second.rowsFiltered == second.rowsRead)

    val total = sink.read("events_out").count()
    assert(total == first.rowsWritten)
  }

  test("cursor/window column need not be in the projected field list") {
    // Reference semantics: `SELECT <fields> WHERE cursor BETWEEN …` — the
    // cursor is not part of the projection (`clickhouse/reader/main.go:164`).
    val tmp = Files.createTempDirectory("graft-transfer2").toString
    val src = new FileConnector(spark, sf0001)
    val sink = new FileConnector(spark, tmp)
    val cfg = Transfer.Config(
      table = "events", target = "out",
      fields = Seq("event_id", "event_type", "value"), // no ts, no user_id
      window = Some(Window("ts", "timestamp'2024-01-01'", "timestamp'2024-01-08'")),
      orderBy = Seq("user_id DESC"),                   // sort col not projected
      increment = true)
    val first = Transfer.run(src, sink, cfg)
    assert(first.rowsWritten > 0)
    assert(sink.read("out").columns.toSeq == Seq("event_id", "event_type", "value"))
    // Second incremental run: target lacks ts, snapshot skips the window.
    val second = Transfer.run(src, sink, cfg)
    assert(second.rowsWritten == 0)
  }

  test("window predicate filters the cursor range") {
    val src = new FileConnector(spark, sf0001)
    val all = Transfer.plan(src, Transfer.Config("events", "x")).count()
    val windowed = Transfer.plan(src, Transfer.Config("events", "x",
      window = Some(Window("ts", "timestamp'2024-01-01'", "timestamp'2024-01-08'")))).count()
    assert(windowed > 0 && windowed < all)
  }
}
