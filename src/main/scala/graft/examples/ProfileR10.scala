package graft.examples

import Profiling.{noop, time}

/** Scratch: round-10 timing checks (weak-query rewrites, and the
  * arrow corpus after body-compression cycling entered it).
  */
object ProfileR10 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Profiling.session()
    graft.GraftExtensions.register(spark)
    val qs = graft.SparkEntry.queries
    for (name <- Seq("arrow_ipc_records", "arrow_ipc_records", "anomaly_mad",
        "dedup_minhash_lsh")) {
      time(name)(noop(qs(name)(spark, dir)))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
