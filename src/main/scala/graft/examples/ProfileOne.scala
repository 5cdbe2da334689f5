package graft.examples

import org.apache.spark.sql.SparkSession

/** Time one SparkEntry query, cold then warm, in a fresh JVM:
  *   sbt "runMain graft.examples.ProfileOne <query> [sfDir]"
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      // Same materializing action as Bench, so numbers are comparable.
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"RUN$i $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
