package graft.examples

import Profiling.{noop, time}

/** Scratch: round-10 timing of the two queries the r9 verdict marked
  * weak, after their plan changes (anomaly_mad: single-column
  * checkpoint feeding all four sketch passes; dedup_minhash_lsh:
  * codegen'd MinHashSig replacing the explode+groupBy signature).
  */
object ProfileR10 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Profiling.session()
    graft.GraftExtensions.register(spark)
    val qs = graft.SparkEntry.queries
    for (name <- Seq("anomaly_mad", "dedup_minhash_lsh",
        "dedup_incremental_minhash", "corpus_curate")) {
      time(name)(noop(qs(name)(spark, dir)))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
