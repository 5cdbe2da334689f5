package graft.examples

import Profiling.noop
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch: per-job breakdown of anomaly_mad. */
object ProfileR10b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Profiling.session()
    graft.GraftExtensions.register(spark)
    val qs = graft.SparkEntry.queries
    val starts = scala.collection.concurrent.TrieMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = js.time
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        println(f"JOB ${je.jobId}%3d: ${(je.time - starts.getOrElse(je.jobId, je.time)) / 1e3}%.2f s")
    })
    noop(qs("anomaly_mad")(spark, dir)) // warmup
    println("=== timed ===")
    val t0 = System.nanoTime()
    noop(qs("anomaly_mad")(spark, dir))
    println(f"TOTAL: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
