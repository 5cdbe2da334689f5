package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Source/sink format coverage beyond parquet + JDBC + TSV: the events
  * table (timestamps with micros, doubles, JSON-bearing strings with
  * quotes/commas) must round-trip LOSSLESSLY through ORC, JSON-lines,
  * and quoted CSV — the interchange formats a user of the engine
  * reads and writes besides the lake-native ones.
  */
class FormatsSpec extends SparkSpec {

  test("events round-trip losslessly through ORC, JSON-lines and CSV") {
    val ev = Tables.load(spark, sf0001, "events")
    val expect = ev.collect().map(_.toSeq).toSet
    for (fmt <- Seq("orc", "json", "csv")) {
      val dir = Files.createTempDirectory(s"graft-fmt-$fmt").toString + "/t"
      // Explicit micros pattern on BOTH text formats: the default
      // timestamp rendering truncates to millis (JSON) or drops
      // trailing zeros (CSV) — six fixed fraction digits written and
      // read back make the trip bit-exact. ORC is binary and needs
      // nothing.
      val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      val w = ev.write.mode("overwrite").format(fmt)
      (fmt match {
        case "csv" => w.option("header", "true").option("timestampFormat", tsFmt)
        case "json" => w.option("timestampFormat", tsFmt)
        case _ => w
      }).save(dir)
      val r = spark.read.format(fmt).schema(ev.schema)
      val back = (fmt match {
        case "csv" => r.option("header", "true").option("timestampFormat", tsFmt)
        case "json" => r.option("timestampFormat", tsFmt)
        case _ => r
      }).load(dir)
      assert(back.collect().map(_.toSeq).toSet == expect,
        s"$fmt round-trip diverged")
    }
  }
}
