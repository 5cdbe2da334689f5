package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.sources.Tables

/** Scratch: stage breakdown of sketch_cms_freq at sf0.1. */
object ProfileCms {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val li = Tables.load(spark, dir, "lineitem")
    time("scan only")(noop(li.select("l_suppkey")))
    val sketch = Sketches.cmsSketch(li, "l_suppkey", 4, 256)
    time("sketch build")(noop(sketch))
    val keys = li.where(col("l_suppkey") <= 20).select("l_suppkey").distinct()
    time("query keys")(noop(keys))
    val est = Sketches.cmsEstimate(sketch, keys, "l_suppkey", 4, 256)
    time("est (build+probe)")(noop(est))
    val exact = li.where(col("l_suppkey") <= 20)
      .groupBy("l_suppkey").agg(count(lit(1)).as("true_cnt"))
    time("exact counts")(noop(exact))
    time("full query")(noop(graft.SparkEntry.queries("sketch_cms_freq")(spark, dir)))
    spark.stop()
  }
}
