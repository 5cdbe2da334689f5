package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query gets one untimed warmup execution
  * (JIT + codegen compilation + parquet footer caching) and one timed
  * run — the steady-state number is what a long-lived cluster session
  * would see, and it is stable across invocations instead of being
  * dominated by first-query JVM warmup noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default matches the driver's environment (local[32]) so local bench
    // numbers predict driver bench numbers.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The timed action is a noop-format write: every output row is fully
    // materialized through the executed plan, so projections, sorts and
    // expression work stay IN the measurement (a bare `count()` lets
    // Catalyst prune projection columns and drop orderBys — it times a
    // row-count scan, not the declared query).
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Each query: one untimed warmup, then timed runs until the best
    // two agree within 30% (capped at 4) — report the min. A shared
    // sandbox can stall any single run 10-20× (co-tenant CPU bursts,
    // GC); with a fixed two-run min BOTH runs can land inside one
    // contention window, so the stop rule keeps sampling until two
    // independent runs corroborate the steady-state cost. Cache state
    // is reset BETWEEN queries so each measurement starts from the same
    // (empty) storage pool instead of whatever earlier queries left
    // behind: accumulated persists can evict a query's own warmup cache
    // mid-bench, which showed up as a 3× swing on the driver that no
    // local run reproduced.
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); run(fn); (System.nanoTime() - t0) / 1e9
    }
    def steady(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      var times = List(timed(fn), timed(fn)).sorted
      while (times.length < 4 && times(1) > times.head * 1.3)
        times = (timed(fn) :: times).sorted
      times.head
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        run(fn) // warmup: codegen + JIT + IO caches
        name -> steady(fn)
      } catch { case _: Throwable => name -> -1.0 }
      finally spark.catalog.clearCache()
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
