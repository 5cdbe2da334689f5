package graft.examples

/** Scratch: run a named subset of SparkEntry.queries at a given SF dir
  * and dump parquet per query (the Verify shape, filtered) — for fast
  * oracle iteration on new queries without a full 300-query sweep.
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val spark = Profiling.session()
    graft.GraftExtensions.register(spark)
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"WROTE $n")
    }
    spark.stop()
  }
}
