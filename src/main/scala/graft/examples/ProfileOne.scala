package graft.examples

/** Time one SparkEntry query, cold then warm, in a fresh JVM:
  *   sbt "runMain graft.examples.ProfileOne <query> [sfDir]"
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Profiling.session()
    val fn = graft.SparkEntry.queries(name)
    // GRAFT_EXPLAIN=1 dumps the formatted physical plan before timing
    // (the scale audit: joins chosen, filters pushed, codegen spans)
    if (sys.env.contains("GRAFT_EXPLAIN")) fn(spark, dir).explain("formatted")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      Profiling.noop(fn(spark, dir))
      println(f"RUN$i $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
