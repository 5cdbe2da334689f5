package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import graft.sources.FileConnector

/** W1: the TSV sink path must sanitize embedded tabs (tab → 4 spaces,
  * `clickhouse/types/types.go:60`) so rows stay parseable.
  */
class TsvSinkSpec extends SparkSpec {
  import spark.implicits._

  test("csv (TSV) sink replaces tabs in string cells") {
    val tmp = Files.createTempDirectory("graft-tsv").toString
    val sink = new FileConnector(spark, tmp, format = "csv")
    val df = Seq((1L, "plain"), (2L, "has\ttab"), (3L, "two\t\ttabs"))
      .toDF("id", "s")
    sink.write(df, "t", SaveMode.Overwrite)

    // Read the emitted part files directly: the assertion is about the
    // bytes on disk. (spark.read.text returns empty in the forked test
    // JVM — quirk noted, irrelevant to the sink contract.)
    val files = new java.io.File(s"$tmp/t.csv").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
    val raw = files.flatMap(f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines().toList)
      .filterNot(_ == "id\ts") // per-part header lines
    assert(raw.length == 3, s"raw=${raw.toSeq}")
    // Only the field separator tabs remain — cell content tabs are gone.
    assert(raw.forall(_.count(_ == '\t') == 1))
    assert(raw.exists(_.contains("has    tab")))

    // Spark round trip through the connector (header + sep symmetric).
    val back = sink.read("t")
    assert(back.count() == 3)
    assert(back.columns.toSeq == Seq("id", "s"))
  }
}
