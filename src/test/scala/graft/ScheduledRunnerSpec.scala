package graft

import java.nio.file.Files
import graft.pipeline.{ScheduledRunner, Transfer, Window}
import graft.sources.FileConnector

class ScheduledRunnerSpec extends SparkSpec {

  test("repeated ticks are incremental: second tick transfers nothing new") {
    val tmp = Files.createTempDirectory("graft-sched").toString
    val src = new FileConnector(spark, sf0001)
    val sink = new FileConnector(spark, tmp)
    val cfg = Transfer.Config(table = "events", target = "out",
      fields = Seq("event_id", "user_id", "event_type", "value"),
      window = Some(Window("user_id", "0", "10")), increment = true)
    var seen = List.empty[graft.pipeline.RunStats]
    val runner = new ScheduledRunner(src, sink, cfg, 3600, s => seen ::= s)

    val first = runner.tick()
    assert(first.rowsWritten > 0)
    val second = runner.tick()
    assert(second.rowsWritten == 0 && second.rowsFiltered == second.rowsRead)
    assert(runner.last.contains(second) && seen.length == 2)
    runner.stop()
  }
}
