package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared scaffolding for the scratch profilers: ONE place that owns the
  * driver-parity session config and the bench-parity measurement rules
  * (noop-write action, warmup before timing) so a methodology change —
  * like round 2's count()→noop switch — edits one file, not every
  * profiler.
  */
object Profiling {

  /** Driver-parity local session (local[32], 32 shuffle partitions,
    * UTC, AQE on, UI off).
    */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  /** The bench's materializing action: every output row flows through
    * the executed plan (count() lets Catalyst prune the work away).
    */
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** One untimed warmup, then print the timed run. */
  def time(label: String)(f: => Unit): Unit = {
    f
    val t0 = System.nanoTime(); f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
}
