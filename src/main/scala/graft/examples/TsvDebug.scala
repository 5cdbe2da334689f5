package graft.examples

import org.apache.spark.sql.{SaveMode, SparkSession}
import graft.sources.FileConnector

object TsvDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tsvdbg").toString
    val sink = new FileConnector(spark, tmp, format = "csv")
    val df = Seq((1L, "plain"), (2L, "has\ttab")).toDF("id", "s")
    sink.write(df, "t", SaveMode.Overwrite)
    println("DIR: " + tmp)
    println("TEXT ROWS: " + spark.read.text(s"$tmp/t.csv").count())
    println("CSV ROWS: " + sink.read("t").count())
    spark.stop()
  }
}
